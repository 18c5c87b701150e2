"""Parameter-layout conversion between unrolled and scanned models.

``MapAnythingConfig(scan_layers=True)`` replaces the Python loops over the
encoder's blocks and the trunk's (global, frame) layer pairs with
``nn.scan`` — identical numerics, ~an order of magnitude smaller HLO (the
compile-time cut for the driver's virtual-CPU flagship dryrun). The price
is a different parameter layout:

  unrolled encoder: ``encoder/block_{i}/...``           (depth separate trees)
  scanned  encoder: ``encoder/blocks/block/...``        (leading depth axis)
  unrolled trunk:   ``info_sharing/block_{i}/...``
  scanned  trunk:   ``info_sharing/pairs/{gblock,fblock}/...``
                    (leading depth//2 axis; gblock = even layers,
                     fblock = odd layers)

These helpers convert whole-model parameter trees both ways so torch-
converted / parity-tested unrolled checkpoints drive the scanned model and
vice versa. Equality of the two models under conversion is tested in
``tests/test_scan_layers.py``.
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp


def _stack_trees(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def _unstack_tree(tree, n):
    return [jax.tree.map(lambda x: x[i], tree) for i in range(n)]


def _block_keys(subtree):
    """Sorted ``block_{i}`` keys present in a module's param subtree."""
    keys = [k for k in subtree if re.fullmatch(r"block_\d+", k)]
    return sorted(keys, key=lambda k: int(k.split("_")[1]))


def encoder_unrolled_to_scanned(enc: dict) -> dict:
    keys = _block_keys(enc)
    out = {k: v for k, v in enc.items() if k not in keys}
    out["blocks"] = {"block": _stack_trees([enc[k] for k in keys])}
    return out


def encoder_scanned_to_unrolled(enc: dict) -> dict:
    out = {k: v for k, v in enc.items() if k != "blocks"}
    stacked = enc["blocks"]["block"]
    depth = jax.tree.leaves(stacked)[0].shape[0]
    for i, blk in enumerate(_unstack_tree(stacked, depth)):
        out[f"block_{i}"] = blk
    return out


def trunk_unrolled_to_scanned(trunk: dict) -> dict:
    keys = _block_keys(trunk)
    assert len(keys) % 2 == 0, "alternating trunk depth must be even"
    out = {k: v for k, v in trunk.items() if k not in keys}
    out["pairs"] = {
        "gblock": _stack_trees([trunk[k] for k in keys[0::2]]),
        "fblock": _stack_trees([trunk[k] for k in keys[1::2]]),
    }
    return out


def trunk_scanned_to_unrolled(trunk: dict) -> dict:
    out = {k: v for k, v in trunk.items() if k != "pairs"}
    g, f = trunk["pairs"]["gblock"], trunk["pairs"]["fblock"]
    n_pairs = jax.tree.leaves(g)[0].shape[0]
    for i, (gb, fb) in enumerate(
        zip(_unstack_tree(g, n_pairs), _unstack_tree(f, n_pairs))
    ):
        out[f"block_{2 * i}"] = gb
        out[f"block_{2 * i + 1}"] = fb
    return out


def params_unrolled_to_scanned(params: dict) -> dict:
    """Convert a whole MapAnything param tree (the ``params`` collection)
    from the unrolled layout to the scanned one."""
    out = dict(params)
    if "encoder" in out:
        out["encoder"] = encoder_unrolled_to_scanned(out["encoder"])
    if "info_sharing" in out:
        out["info_sharing"] = trunk_unrolled_to_scanned(out["info_sharing"])
    return out


def params_scanned_to_unrolled(params: dict) -> dict:
    out = dict(params)
    if "encoder" in out:
        out["encoder"] = encoder_scanned_to_unrolled(out["encoder"])
    if "info_sharing" in out:
        out["info_sharing"] = trunk_scanned_to_unrolled(out["info_sharing"])
    return out
