import jax.numpy as jnp
import numpy as np
import pytest

from garden_tpu.core.ecs import ComponentDef, EventRegistry, Field, System, World


TAG = ComponentDef("tag", {"value": Field((), jnp.int32, 0)})
POS = ComponentDef("pos", {"p": Field((3,), jnp.float32, 0.0)})


def test_entity_lifecycle():
    w = World(capacity=8)
    a = w.create_entity()
    b = w.create_entity()
    assert a != b and w.is_alive(a) and w.is_alive(b)
    w.destroy_entity(a)
    assert not w.is_alive(a)
    c = w.create_entity()  # slot reuse
    assert w.is_alive(c)
    assert w.entity_count() == 2


def test_capacity_exhaustion():
    w = World(capacity=2)
    w.create_entity()
    w.create_entity()
    with pytest.raises(RuntimeError):
        w.create_entity()


def test_component_roundtrip():
    w = World(capacity=4)
    w.register_component(POS)
    e = w.create_entity()
    w.add_component(e, "pos", p=[1.0, 2.0, 3.0])
    assert w.has_component(e, "pos")
    np.testing.assert_allclose(w.get_component(e, "pos")["p"], [1.0, 2.0, 3.0])
    w.destroy_entity(e)
    assert not w.has_component(e, "pos")


def test_device_state_and_adopt():
    w = World(capacity=4)
    w.register_component(POS)
    e = w.create_entity()
    w.add_component(e, "pos", p=[1.0, 0.0, 0.0])
    state = w.device_state()

    def move(state):
        comp = state["components"]["pos"]
        delta = jnp.array([1.0, 0.0, 0.0]) * comp["has"][:, None]
        comp = dict(comp, p=comp["p"] + delta)
        return dict(state, components=dict(state["components"], pos=comp))

    state = move(state)
    w.adopt(state)
    np.testing.assert_allclose(w.get_component(e, "pos")["p"], [2.0, 0.0, 0.0])
    # dead slots untouched
    assert w.entity_count() == 1


def test_event_ordering():
    reg = EventRegistry()
    calls = []
    reg.subscribe("Update", lambda s, c: (calls.append("b"), s)[1], priority=1.0)
    reg.subscribe("Update", lambda s, c: (calls.append("a"), s)[1], priority=0.0)
    reg.subscribe("Update", lambda s, c: (calls.append("c"), s)[1], priority=1.0)
    reg.run("Update", {})
    assert calls == ["a", "b", "c"]


def test_system_registration_and_init():
    inits = []

    class MySystem(System):
        component = TAG

        def attach(self, world):
            super().attach(world)
            world.events.subscribe("Init", lambda w: inits.append("init"))

    w = World(capacity=4)
    w.create_system(MySystem())
    assert "tag" in list(w.component_names())
    w.initialize()
    assert inits == ["init"]
    with pytest.raises(RuntimeError):
        w.initialize()
