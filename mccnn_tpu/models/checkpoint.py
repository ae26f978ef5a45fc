"""Checkpoint save/load.

Replaces the reference's ascii-.t7 checkpoints (main.lua:587-600) with
a single .npz holding the flattened parameter pytree plus the full
config dict — same role: `net/net_<cmd_str>.npz`. Unlike the
reference, optimizer/momentum state can be included, enabling true
mid-training resume (SURVEY.md §5 lists this as absent upstream).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np


def _flatten(tree: Any, prefix: str = "") -> dict:
    flat = {}
    leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in leaves:
        key = prefix + jax.tree_util.keystr(path)
        flat[key] = np.asarray(leaf)
    return flat


def save(fname: str, params: Any, opt: dict, extra: Optional[dict] = None) -> str:
    os.makedirs(os.path.dirname(os.path.abspath(fname)), exist_ok=True)
    flat = _flatten(params, "params")
    if extra:
        for name, tree in extra.items():
            flat.update(_flatten(tree, name))
    meta = {"opt": opt, "treedef": None}
    np.savez(fname, __meta__=json.dumps(meta, default=str), **flat)
    return fname


def load(fname: str, params_template: Any, extra_templates: Optional[dict] = None):
    """Load into the structure of `params_template` (and optional extra
    trees); returns (params, opt_dict, extras)."""
    data = np.load(fname, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))

    def fill(template, prefix):
        leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
        new = []
        for path, leaf in leaves:
            key = prefix + jax.tree_util.keystr(path)
            arr = data[key]
            assert arr.shape == np.shape(leaf), (key, arr.shape, np.shape(leaf))
            new.append(arr)
        return jax.tree_util.tree_unflatten(treedef, new)

    params = fill(params_template, "params")
    extras = {}
    if extra_templates:
        for name, tmpl in extra_templates.items():
            extras[name] = fill(tmpl, name)
    return params, meta["opt"], extras
