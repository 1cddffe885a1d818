"""Code-decoupled pytree checkpoints.

The reference pickles whole nn.Module objects (train.py:482-509), coupling
checkpoints to the module import path (SURVEY.md §5). Here checkpoints are
plain flattened-key .npz archives plus a JSON meta blob — loadable with
nothing but numpy, forward-compatible, and trivially shardable. An Orbax
path is provided for async/multi-host checkpointing of full train state.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

_SEP = "/"
_META_KEY = "__meta__"


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}{_SEP}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}#{i}{_SEP}"))
    else:
        out[prefix[: -len(_SEP)]] = np.asarray(tree)
    return out


def _unflatten(flat):
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def fix_lists(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.startswith("#") for k in node):
            return [fix_lists(node[f"#{i}"]) for i in range(len(node))]
        return {k: fix_lists(v) for k, v in node.items()}

    return fix_lists(tree)


def save(path, tree, meta=None):
    """Save a parameter pytree (+ JSON-able meta) to one .npz file."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = _flatten(tree)
    if meta is not None:
        flat[_META_KEY] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **flat)


def load(path):
    """Load a .npz checkpoint -> (pytree, meta)."""
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    meta = None
    if _META_KEY in flat:
        meta = json.loads(bytes(flat.pop(_META_KEY).tobytes()).decode())
    return _unflatten(flat), meta


def save_train_state(directory, step, networks, opt_state=None, extra=None):
    """Checkpoint the three networks + optimizer state under a step dir,
    mirroring the reference's latest+per-iteration layout
    (train.py:482-509)."""
    directory = Path(directory)
    meta = {"step": int(step), **(extra or {})}
    for name, params in networks.items():
        save(directory / f"{name}.npz", params, meta)
    if opt_state is not None:
        save(directory / "opt_state.npz", opt_state, meta)
    (directory / "checkpoint.json").write_text(json.dumps(meta, indent=2))


def load_train_state(directory):
    directory = Path(directory)
    meta = json.loads((directory / "checkpoint.json").read_text())
    networks = {}
    for f in sorted(directory.glob("*.npz")):
        if f.stem == "opt_state":
            continue
        networks[f.stem], _ = load(f)
    opt_state = None
    if (directory / "opt_state.npz").exists():
        opt_state, _ = load(directory / "opt_state.npz")
    return networks, opt_state, meta


# ---------------------------------------------------------------------------
# Orbax integration (async / multi-host checkpointing)
# ---------------------------------------------------------------------------

def save_orbax(directory, step, state):
    """Checkpoint a full train-state pytree with Orbax (async-capable,
    multi-host-aware). ``state`` is any pytree of arrays."""
    import orbax.checkpoint as ocp

    directory = Path(directory).absolute()
    with ocp.CheckpointManager(directory) as mngr:
        mngr.save(int(step), args=ocp.args.StandardSave(state))
        mngr.wait_until_finished()


def load_orbax(directory, step=None, template=None):
    """Restore a train-state pytree saved by `save_orbax`. Returns
    (state, step)."""
    import orbax.checkpoint as ocp

    directory = Path(directory).absolute()
    with ocp.CheckpointManager(directory) as mngr:
        if step is None:
            step = mngr.latest_step()
        if template is not None:
            state = mngr.restore(step, args=ocp.args.StandardRestore(template))
        else:
            state = mngr.restore(step)
    return state, step
