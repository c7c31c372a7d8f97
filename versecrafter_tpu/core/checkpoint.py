"""Native checkpoint save/load (orbax) for framework-trained params.

The reference has no training checkpointing (SURVEY.md §5.4 — DeepSpeed
would have handled it in the unreleased training code); here it is
first-class: param pytrees + optimizer state saved via orbax with sharding
restored onto the current mesh.
"""

from __future__ import annotations

import os
from typing import Any

import jax


def save_checkpoint(path: str, tree: Any) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, template: Any = None,
                    shardings: Any = None) -> Any:
    """Restore a pytree; with `template` (abstract or concrete) the dtypes/
    shapes are validated and `shardings` (NamedSharding tree) places leaves
    directly on the mesh."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is None:
        return ckptr.restore(path)
    abstract = jax.tree.map(
        lambda x, s=None: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
        template) if shardings is None else jax.tree.map(
        lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
        template, shardings)
    return ckptr.restore(path, abstract)
