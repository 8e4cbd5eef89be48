"""State checkpointing: pytree snapshots + scene-JSON interop.

Rebuild of the reference's checkpoint story (SURVEY.md section 5.4): scenes
are the checkpoints (storeScene/loadScene serialize every component,
resource.hpp:463-476), settings persist as JSON, and the pipeline cache
persists compiled artifacts. TPU equivalents:

- `save`/`load`: the full engine state pytree as an .npz snapshot
  (exact-bitwise resume, including physics warm-start impulses).
- scene JSON via garden_tpu.scene (human-readable interop, reference format).
- compiled-function cache via jax's persistent compilation cache
  (`enable_compilation_cache`).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SEP = "\x1f"


def _flatten(state: Any) -> Tuple[Dict[str, np.ndarray], Any]:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    flat = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    return flat, treedef


def save(path: str, state: Any) -> None:
    """Snapshot a state pytree to .npz (+ structure file)."""
    flat, treedef = _flatten(state)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **flat)
    with open(path + ".tree", "w", encoding="utf-8") as f:
        f.write(str(treedef))


def load(path: str, like: Any) -> Any:
    """Restore a snapshot; `like` provides the pytree structure."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves, treedef = jax.tree_util.tree_flatten(like)
    restored = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, restored)


def enable_compilation_cache(cache_dir: str = ".jax_cache") -> None:
    """Persistent compiled-program cache (the VulkanAPI pipeline-cache
    analog, api.hpp:286 storePipelineCache)."""
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def debug_guards(enable: bool = True) -> None:
    """NaN/Inf guards (the validation-layer analog, SURVEY.md 5.2)."""
    jax.config.update("jax_debug_nans", enable)
    jax.config.update("jax_debug_infs", enable)
