import jax.numpy as jnp
import numpy as np

from garden_tpu.core.config import EngineConfig
from garden_tpu.engine import Engine
from garden_tpu.ops import blur
from garden_tpu.render.sprites import (
    Sprite, SpriteBatch, TextureAtlas, composite_sprites,
)
from garden_tpu.render.text import FontAtlas
from garden_tpu.systems.ui import (
    ANCHOR_CENTER, UiButtonSystem, UiCheckboxSystem, UiTransformSystem,
)


def test_sprite_composite_and_nine_slice():
    atlas = TextureAtlas(64)
    red = atlas.add(np.tile(np.array([1.0, 0.0, 0.0, 1.0], np.float32),
                            (8, 8, 1)))
    batch = SpriteBatch(atlas, capacity=16)
    batch.push(Sprite(10, 10, 20, 20, red))
    batch.push_nine_slice(40, 5, 24, 24, atlas.white, border=0.5,
                          color=(0, 1, 0, 0.5))
    img = jnp.zeros((48, 80, 3))
    out = np.asarray(composite_sprites(img, atlas.device(),
                                       batch.device_arrays()))
    # red sprite covers (10..30)x(10..30)
    np.testing.assert_allclose(out[20, 20], [1, 0, 0], atol=1e-5)
    # nine-slice half-transparent green
    np.testing.assert_allclose(out[15, 50], [0, 0.5, 0], atol=1e-5)
    # untouched background is black
    np.testing.assert_allclose(out[40, 5], [0, 0, 0], atol=1e-6)


def test_text_rendering():
    atlas = TextureAtlas(256)
    font = FontAtlas(atlas)
    batch = SpriteBatch(atlas, capacity=128)
    font.draw(batch, "FPS 60", 2, 2, color=(1, 1, 0, 1))
    img = jnp.zeros((24, 96, 3))
    out = np.asarray(composite_sprites(img, atlas.device(),
                                       batch.device_arrays()))
    assert out.sum() > 1.0  # glyph pixels landed
    assert out[..., 2].max() < 0.2  # yellow text: no blue
    assert font.measure("FPS 60") > 20


def test_ui_button_click_and_checkbox():
    eng = Engine(EngineConfig(capacity=8))
    eng.create_system(UiTransformSystem())
    buttons = eng.create_system(UiButtonSystem())
    eng.create_system(UiCheckboxSystem())
    eng.initialize()

    e = eng.world.create_entity()
    eng.world.add_component(e, "ui_transform", position=[0, 0],
                            size=[100, 30], anchor=ANCHOR_CENTER)
    eng.world.add_component(e, "ui_button")
    eng.world.add_component(e, "ui_checkbox")
    clicks = []
    buttons.on_click(e, lambda ent: clicks.append(ent))

    frame = (640.0, 360.0)
    center = (320.0, 180.0)
    # press inside, release inside -> click + checkbox toggles
    buttons.process(center, True, frame)
    clicked = buttons.process(center, False, frame)
    assert clicked == [e] and clicks == [e]
    assert bool(eng.world._stores["ui_checkbox"]["checked"][e])
    # press outside -> nothing
    buttons.process((5.0, 5.0), True, frame)
    assert buttons.process((5.0, 5.0), False, frame) == []


def test_blur_ops():
    img = jnp.zeros((32, 32, 3)).at[16, 16].set(1.0)
    g = np.asarray(blur.gaussian_blur(img, radius=2))
    assert g[16, 16, 0] < 1.0 and g[16, 18, 0] > 0.0
    np.testing.assert_allclose(g.sum(), 3.0, rtol=1e-4)  # energy preserved
    b = np.asarray(blur.box_blur(img, radius=1))
    np.testing.assert_allclose(b.sum(), 3.0, rtol=1e-4)
    d = blur.downsample2x(img)
    assert d.shape == (16, 16, 3)
    # bilateral: respects depth edges
    depth = jnp.ones((32, 32)).at[:, 16:].set(5.0)
    img2 = jnp.zeros((32, 32)).at[:, 16:].set(1.0)
    bb = np.asarray(blur.bilateral_blur(img2, depth, radius=2))
    assert bb[16, 14] < 0.1 and bb[16, 18] > 0.9  # edge preserved


def test_ui_label_input_scissor_trigger():
    """Label text sprites, text-input editing with focus + caret, scissor
    clipping, trigger enter/exit (reference system/ui/ label 625 LoC, input
    436 LoC, scissor + trigger systems)."""
    from garden_tpu.systems.ui import (
        UiInputSystem, UiLabelSystem, UiScissorSystem, UiTriggerSystem,
    )

    eng = Engine(EngineConfig(capacity=8))
    eng.create_system(UiTransformSystem())
    labels = eng.create_system(UiLabelSystem())
    inputs = eng.create_system(UiInputSystem())
    eng.create_system(UiScissorSystem())
    triggers = eng.create_system(UiTriggerSystem())
    eng.initialize()
    frame = (640.0, 360.0)

    # label
    lab = eng.world.create_entity()
    eng.world.add_component(lab, "ui_transform", position=[10, 10],
                            size=[200, 20])
    eng.world.add_component(lab, "ui_label")
    labels.set_text(lab, "Hello")

    atlas = TextureAtlas(256)
    font = FontAtlas(atlas)
    batch = SpriteBatch(atlas, capacity=128)
    labels.emit(batch, font, frame)
    assert batch._count == 5  # one sprite per glyph

    # input: click to focus, type, backspace, submit
    inp = eng.world.create_entity()
    eng.world.add_component(inp, "ui_transform", position=[10, 40],
                            size=[150, 22])
    eng.world.add_component(inp, "ui_input")
    submitted = []
    inputs.on_submit(inp, lambda e, s: submitted.append(s))
    inputs.process_click((20.0, 45.0), frame)
    assert bool(eng.world._stores["ui_input"]["focused"][inp])
    inputs.process_text("hiy\b")
    assert inputs.text(inp) == "hi"
    inputs.process_text("\n")
    assert submitted == ["hi"]
    batch.clear()
    inputs.emit(batch, font, frame)
    assert batch._count == 3  # 2 glyphs + caret

    # scissor clips label sprites outside its rect
    sc = eng.world.create_entity()
    eng.world.add_component(sc, "ui_transform", position=[0, 0],
                            size=[30, 100])
    eng.world.add_component(sc, "ui_scissor")
    batch.clear()
    labels.emit(batch, font, frame)
    rects = batch._rects[: batch._count]
    assert (rects[:, 0] + rects[:, 2] <= 30.0 + 1e-4).all()

    # trigger enter/exit
    trg = eng.world.create_entity()
    eng.world.add_component(trg, "ui_transform", position=[300, 100],
                            size=[50, 50])
    eng.world.add_component(trg, "ui_trigger")
    seen = []
    triggers.on_enter(trg, lambda e: seen.append("enter"))
    triggers.on_exit(trg, lambda e: seen.append("exit"))
    assert triggers.process((310.0, 110.0), frame) == [(trg, "enter")]
    assert triggers.process((315.0, 120.0), frame) == []   # stay inside
    assert triggers.process((5.0, 5.0), frame) == [(trg, "exit")]
    assert seen == ["enter", "exit"]


def test_font_metrics_and_kerning():
    """Per-glyph fidelity (text.cpp FT metrics): real advances (not ink
    widths), bearings for baseline alignment, and a kerning table measured
    through the font's own layout engine."""
    atlas = TextureAtlas(256)
    font = FontAtlas(atlas)
    # advance-accurate measurement: 'iii' must be much narrower than 'WWW'
    assert font.measure("iii") < font.measure("WWW") * 0.8
    # measure equals the sum of advances (+kerning), not ink widths:
    # a trailing space must widen the line
    assert font.measure("a ") > font.measure("a")
    # line metrics exposed
    assert font.line_height() >= font.size * 0.8
    # bearings recorded: descender glyphs ('g','y') carry a lower ink box
    # than cap-height glyphs in the em box (bearing_y smaller for 'A')
    _, _, _, by_a = font.glyphs["A"]
    _, _, _, by_g = font.glyphs["g"]
    assert by_g >= by_a
    # kerning table is a dict of nonzero pair deltas (may be empty for
    # metrics-less bitmap fonts, but must exist and be queryable)
    assert isinstance(font.kerning, dict)
