"""Checkpoint / resume for simulation state.

The reference persists trajectory data via reporters but has **no** code path
that reconstructs a sampler from disk (SURVEY.md section 5: "no code path
reconstructs a sampler from a reporter file").  This module adds real
save/restore of the dynamic simulation pytree -- positions, velocities, box
vectors, PRNG key, MC statistics, iteration counters -- so long runs are
restartable, which the north star requires for production deployment.

Format: a single ``.npz`` file holding the flattened pytree leaves plus a
JSON-encoded treedef/metadata header.  No orbax dependency on the load path
keeps restarts trivially portable.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def save_checkpoint(
    path: str,
    state_tree: Any,
    metadata: Optional[Dict[str, Any]] = None,
) -> None:
    """Save an arbitrary pytree of arrays plus JSON metadata to ``path``.

    The write is ATOMIC (temp file + ``os.replace``): a crash mid-save --
    the exact moment periodic checkpointing exists for -- never destroys
    the previous good checkpoint at the same path.  The path is used
    verbatim (``np.savez``'s silent ``.npz`` suffix append is bypassed by
    writing through a file object), so any path round-trips with
    :func:`load_checkpoint`.

    Examples
    --------
    >>> save_checkpoint("run.ckpt.npz", {"sampler": sampler_state.as_data()},
    ...                 metadata={"iteration": 42, "seed": 1234})
    """
    leaves, treedef = jax.tree_util.tree_flatten(state_tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    header = {
        "treedef": str(treedef),
        "n_leaves": len(leaves),
        "metadata": metadata or {},
    }
    arrays["__header__"] = np.frombuffer(
        json.dumps(header).encode("utf-8"), dtype=np.uint8
    )
    tmp = f"{path}.tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, **arrays)
    os.replace(tmp, path)


def load_checkpoint(
    path: str, like: Any = None
) -> Tuple[Any, Dict[str, Any]]:
    """Load a checkpoint.

    Parameters
    ----------
    path : str
        File written by :func:`save_checkpoint`.
    like : pytree, optional
        A structurally-identical pytree (e.g. a freshly constructed state).
        When given, the stored leaves are reassembled into its structure and
        cast back to jnp arrays; when omitted, the flat list of leaves is
        returned.

    Returns
    -------
    (state, metadata)
    """
    with np.load(path, allow_pickle=False) as data:
        header = json.loads(bytes(data["__header__"]).decode("utf-8"))
        leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(header["n_leaves"])]
    metadata = header.get("metadata", {})
    if like is not None:
        treedef = jax.tree_util.tree_structure(like)
        if treedef.num_leaves != len(leaves):
            raise ValueError(
                f"Checkpoint has {len(leaves)} leaves but the template "
                f"pytree has {treedef.num_leaves}"
            )
        # leaf COUNT alone cannot detect a structurally different template
        # (e.g. velocities-but-no-box loaded into box-but-no-velocities:
        # both 3 leaves, silently permuted state) -- compare the stored
        # structure too
        saved_treedef = header.get("treedef")
        if saved_treedef is not None and saved_treedef != str(treedef):
            raise ValueError(
                "Checkpoint pytree structure does not match the template:\n"
                f"  saved:    {saved_treedef}\n"
                f"  template: {treedef}"
            )
        return jax.tree_util.tree_unflatten(treedef, leaves), metadata
    return leaves, metadata


def _move_state(move) -> dict:
    """JSON-serializable restart state of an MCMC move: acceptance
    statistics, the autotuned parameter, and the attempt counters."""
    state = {
        "attempts": int(getattr(move, "_number_of_attempts_made", 0)),
        "move_iteration": int(getattr(move, "_move_iteration", 0)),
    }
    stats = getattr(move, "statistics", None)
    if isinstance(stats, dict):
        state["statistics"] = {k: int(v) for k, v in stats.items()}
    try:
        state["param"] = float(move._param_value())
    except (AttributeError, NotImplementedError):
        pass
    return state


def _restore_move_state(move, state: dict) -> None:
    move._number_of_attempts_made = int(state.get("attempts", 0))
    move._move_iteration = int(state.get("move_iteration", 0))
    if "statistics" in state and hasattr(move, "statistics"):
        move.statistics = {
            k: int(v) for k, v in state["statistics"].items()
        }
    if "param" in state and hasattr(move, "_set_param_value"):
        move._set_param_value(float(state["param"]))


def save_sampler_checkpoint(path, sampler_state, iteration=0, extra=None,
                            moves=None):
    """Convenience wrapper: persist a SamplerState(+counters) for restart.

    ``moves`` (optional) is a ``{name: move}`` mapping (e.g. built from a
    MoveSchedule): each move's acceptance statistics, autotuned parameter
    (displacement sigma / volume scale), and attempt counters are stored
    in the metadata so a restart resumes the chain's tuning instead of
    silently resetting it (pass the same mapping to
    :func:`load_sampler_checkpoint`)."""
    data = sampler_state.as_data()
    meta = {
        "iteration": int(iteration),
        # optional-field presence, so restore can match leaves to FIELDS
        # rather than just counting them (a velocities-but-no-box
        # checkpoint must not silently load into a box-but-no-velocities
        # template -- ADVICE r1)
        "fields": {
            "velocities": data.velocities is not None,
            "box_vectors": data.box_vectors is not None,
        },
    }
    if moves:
        meta["moves"] = {name: _move_state(m) for name, m in moves.items()}
    if extra:
        meta.update(extra)
    save_checkpoint(path, data, metadata=meta)


def load_sampler_checkpoint(path, sampler_state, moves=None):
    """Restore a SamplerState in place from a checkpoint; returns metadata.

    Pass the same ``{name: move}`` mapping given to
    :func:`save_sampler_checkpoint` to also restore each move's
    acceptance statistics, autotuned parameter, and attempt counters.

    The template's optional fields (velocities, box vectors) are densified
    to match the checkpoint's recorded field-presence header, so leaves are
    matched BY FIELD and a structural mismatch raises instead of silently
    permuting state (e.g. velocities restored into the box slot).
    Checkpoints written before the header existed fall back to leaf-count
    densification.
    """
    import jax.numpy as jnp
    from dataclasses import replace as _replace

    data_like = sampler_state.as_data()
    meta_head = _checkpoint_metadata(path)
    fields = meta_head.get("fields")
    if fields is not None:
        if fields["velocities"] and data_like.velocities is None:
            data_like = _replace(
                data_like, velocities=jnp.zeros_like(data_like.positions)
            )
        if fields["box_vectors"] and data_like.box_vectors is None:
            data_like = _replace(data_like, box_vectors=jnp.zeros((3, 3)))
        if not fields["velocities"] and data_like.velocities is not None:
            raise ValueError(
                "checkpoint has no velocities but the template state does; "
                "construct the template without velocities to restore"
            )
        if not fields["box_vectors"] and data_like.box_vectors is not None:
            raise ValueError(
                "checkpoint has no box vectors but the template state does; "
                "construct the template without box vectors to restore"
            )
    else:  # legacy checkpoint: leaf-count densification
        n_saved = _checkpoint_leaf_count(path)
        if jax.tree_util.tree_structure(data_like).num_leaves != n_saved:
            if data_like.velocities is None:
                data_like = _replace(
                    data_like, velocities=jnp.zeros_like(data_like.positions)
                )
        if jax.tree_util.tree_structure(data_like).num_leaves != n_saved:
            if data_like.box_vectors is None:
                data_like = _replace(
                    data_like, box_vectors=jnp.zeros((3, 3))
                )
    data, meta = load_checkpoint(path, like=data_like)
    sampler_state.update_from_data(data)
    if moves:
        saved_moves = meta.get("moves", {})
        for name, move in moves.items():
            if name in saved_moves:
                _restore_move_state(move, saved_moves[name])
    return meta


def _checkpoint_leaf_count(path) -> int:
    with np.load(path, allow_pickle=False) as data:
        header = json.loads(bytes(data["__header__"]).decode("utf-8"))
    return header["n_leaves"]


def _checkpoint_metadata(path) -> dict:
    with np.load(path, allow_pickle=False) as data:
        header = json.loads(bytes(data["__header__"]).decode("utf-8"))
    return header.get("metadata", {})
