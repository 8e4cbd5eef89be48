"""Entity/body state replication over the network layer.

Rebuild of the reference's replication glue: NetworkSystem's entity-UID map
and NetworkComponent (include/garden/system/network.hpp:75: clientUID,
entityUID, isClientOwned), and PhysicsSystem's NetRigidbody snapshot flow —
`flushNetRigidbodies` applies received snapshots before stepping and
`sendServerMessages` broadcasts bodies within networkViewRadius
(physics.cpp:1224+, physics.hpp:702-709).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from garden_tpu.core.ecs import ComponentDef, Field, System
from garden_tpu.net.protocol import (
    NetRigidbody,
    decode_body_snapshot,
    encode_body_snapshot,
)

NETWORK = ComponentDef(
    "network",
    {
        "client_uid": Field((), jnp.int64, 0),
        "entity_uid": Field((), jnp.int64, 0),
        "is_client_owned": Field((), jnp.bool_, False),
    },
)

# message type chars (physics.hpp:709 / character.hpp "c" convention)
MSG_RIGIDBODY = "r"
MSG_CHARACTER = "c"


class NetworkSystem(System):
    """Entity-UID <-> entity registry (network.hpp:75 analog)."""

    component = NETWORK

    def __init__(self) -> None:
        self._uid_to_entity: Dict[int, int] = {}

    def bind(self, entity: int, entity_uid: int, client_uid: int = 0,
             is_client_owned: bool = False) -> None:
        self.world.add_component(entity, "network", entity_uid=entity_uid,
                                 client_uid=client_uid,
                                 is_client_owned=is_client_owned)
        self._uid_to_entity[entity_uid] = entity

    def entity_of(self, uid: int) -> Optional[int]:
        return self._uid_to_entity.get(uid)


def gather_snapshots(
    physics_state: Dict,
    body_uid: np.ndarray,          # int64[N] (-1 = not replicated)
    view_center=(0.0, 0.0, 0.0),
    view_radius: float = math.inf,
) -> bytes:
    """Server side: encode dynamic bodies within the view radius
    (sendServerMessages analog)."""
    b = physics_state["bodies"]
    pos = np.asarray(b["pos"])
    quat = np.asarray(b["quat"])
    linvel = np.asarray(b["linvel"])
    angvel = np.asarray(b["angvel"])
    has = np.asarray(b["has"])
    motion = np.asarray(b["motion"])
    center = np.asarray(view_center, np.float32)

    snaps: List[NetRigidbody] = []
    for i in np.nonzero(has & (motion == 2) & (body_uid >= 0))[0]:
        if np.linalg.norm(pos[i] - center) > view_radius:
            continue
        snaps.append(NetRigidbody(
            uid=int(body_uid[i]),
            position=tuple(pos[i]),
            rotation=tuple(quat[i]),
            linear_velocity=tuple(linvel[i]),
            angular_velocity=tuple(angvel[i]),
        ))
    return encode_body_snapshot(snaps)


def gather_character(
    physics_state: Dict,
    char_components: Dict,
    entity_uid: Dict[int, int],
) -> bytes:
    """Encode character states (the CharacterSystem's networked 'c' message,
    character.hpp messageType): uid, position, velocity, grounded."""
    from garden_tpu.net.protocol import StreamOutput
    b = physics_state["bodies"]
    pos = np.asarray(b["pos"])
    lv = np.asarray(b["linvel"])
    has = np.asarray(char_components["has"])
    body = np.asarray(char_components["body"])
    grounded = np.asarray(char_components["grounded"])
    out = StreamOutput()
    ents = [e for e in np.nonzero(has & (body >= 0))[0]
            if int(e) in entity_uid]
    out.write_u16(len(ents))
    for e in ents:
        bi = int(body[e])
        out.write_u64(entity_uid[int(e)])
        out.write_vec3(pos[bi])
        out.write_vec3(lv[bi])
        out.write_u8(1 if grounded[e] else 0)
    return out.data()


def apply_character(
    physics_state: Dict,
    char_components: Dict,
    payload: bytes,
    uid_to_entity: Dict[int, int],
) -> Dict:
    """Decode + apply received character states ('c' message receive side).
    Returns the updated physics state (grounded flags are advisory client
    state and land in the component store separately)."""
    from garden_tpu.net.protocol import StreamInput
    inp = StreamInput(payload)
    n = inp.read_u16()
    body = np.asarray(char_components["body"])
    idx, ps, vs = [], [], []
    for _ in range(n):
        uid = inp.read_u64()
        p = inp.read_vec3()
        v = inp.read_vec3()
        inp.read_u8()  # grounded (advisory)
        e = uid_to_entity.get(uid)
        if e is None or body[e] < 0:
            continue
        idx.append(int(body[e]))
        ps.append(p)
        vs.append(v)
    if not idx:
        return physics_state
    b = physics_state["bodies"]
    ii = jnp.asarray(idx, jnp.int32)
    b = dict(b,
             pos=b["pos"].at[ii].set(jnp.asarray(ps, jnp.float32)),
             linvel=b["linvel"].at[ii].set(jnp.asarray(vs, jnp.float32)))
    return dict(physics_state, bodies=b)


def apply_snapshots(
    physics_state: Dict,
    payload: bytes,
    uid_to_body: Dict[int, int],
) -> Dict:
    """Client side: apply a received snapshot before stepping
    (flushNetRigidbodies analog). Returns the updated physics state."""
    snaps = decode_body_snapshot(payload)
    if not snaps:
        return physics_state
    b = physics_state["bodies"]
    idx, pos, quat, lv, av = [], [], [], [], []
    for s in snaps:
        body = uid_to_body.get(s.uid)
        if body is None:
            continue
        idx.append(body)
        pos.append(s.position)
        quat.append(s.rotation)
        lv.append(s.linear_velocity)
        av.append(s.angular_velocity)
    if not idx:
        return physics_state
    idx = jnp.asarray(idx, jnp.int32)
    b = dict(
        b,
        pos=b["pos"].at[idx].set(jnp.asarray(pos, jnp.float32)),
        quat=b["quat"].at[idx].set(jnp.asarray(quat, jnp.float32)),
        linvel=b["linvel"].at[idx].set(jnp.asarray(lv, jnp.float32)),
        angvel=b["angvel"].at[idx].set(jnp.asarray(av, jnp.float32)),
    )
    return dict(physics_state, bodies=b)
