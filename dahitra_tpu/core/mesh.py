"""Device mesh and sharding helpers.

The reference's only parallelism is single-process DataParallel
(models/networks.py:121-126) — replicate the module, scatter the batch,
gather outputs. TPU-native replacement: a ``jax.sharding.Mesh`` with

  * ``data``  — batch data parallelism. Gradients sync via the all-reduce
    GSPMD inserts over ICI; BatchNorm statistics become *global* batch
    stats automatically (an upgrade over DataParallel's per-replica BN).
  * ``space`` — optional spatial parallelism: shard image rows (H) across
    chips. XLA inserts halo exchanges for convolutions, which is how
    1024px+ xBD tiles scale past one chip's HBM without the reference's
    tiling workarounds (SURVEY.md §5 long-context analog).

Inputs are placed with ``shard_batch`` and propagate through jit; no
explicit collectives appear in model code.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_space: int = 1,
              devices=None) -> Mesh:
    """Build a (data, space) mesh. Defaults to all devices on the data axis."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_space
    assert n_data * n_space <= len(devices), (
        f"mesh {n_data}x{n_space} needs more than {len(devices)} devices")
    arr = mesh_utils.create_device_mesh((n_data, n_space),
                                        devices=devices[: n_data * n_space])
    return Mesh(arr, ("data", "space"))


def mesh_from_gpu_ids(gpu_ids: str, n_space: int = 1) -> Mesh:
    """Reference ``--gpu_ids`` semantics (main_cd.py:35, utils.py:98-107):
    comma-separated device ordinals; several ids meant nn.DataParallel over
    them (networks.py:121-126). Maps to the mesh 'data' axis over the
    chosen jax devices. Ordinals beyond the available device count are
    dropped (at least one device is always kept) so fixture runs on a
    single chip or a virtual CPU mesh behave like the reference's
    single-GPU default."""
    ids = []
    for t in str(gpu_ids).split(","):
        t = t.strip()
        if not t:
            continue
        try:
            ids.append(int(t))
        except ValueError:
            raise ValueError(
                f"--gpu_ids {gpu_ids!r}: {t!r} is not a device ordinal")
    devs = jax.devices()
    # De-duplicate preserving order ('0,0' would otherwise reach make_mesh
    # and fail with an opaque duplicate-device error) and surface every
    # dropped ordinal so a degraded selection is visible to the user.
    seen: set = set()
    uniq = [i for i in ids if not (i in seen or seen.add(i))]
    if len(uniq) < len(ids):
        print(f"warning: --gpu_ids {gpu_ids!r} has duplicate ordinals; "
              f"using {uniq}")
    sel = [devs[i] for i in uniq if 0 <= i < len(devs)]
    oob = [i for i in uniq if not 0 <= i < len(devs)]
    if oob:
        print(f"warning: --gpu_ids ordinals {oob} out of range "
              f"(only {len(devs)} device(s) visible); dropped")
    if not sel:
        sel = devs[:1]
    n_space = min(n_space, len(sel))
    n_used = (len(sel) // n_space) * n_space
    if n_used < len(sel):
        print(f"warning: {len(sel)} selected device(s) not divisible by "
              f"n_space={n_space}; using the first {n_used}")
    return make_mesh(n_data=len(sel) // n_space, n_space=n_space,
                     devices=sel)


def batch_sharding(mesh: Mesh, spatial: bool = True) -> NamedSharding:
    """Sharding for NHWC image batches: batch over 'data', rows over 'space'."""
    if spatial:
        return NamedSharding(mesh, P("data", "space"))
    return NamedSharding(mesh, P("data"))


def label_sharding(mesh: Mesh, spatial: bool = True) -> NamedSharding:
    return batch_sharding(mesh, spatial)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, spatial: bool = False) -> dict:
    """Place a host batch dict of (B, H, W, [C]) arrays onto the mesh."""
    sh = batch_sharding(mesh, spatial)
    out = {}
    for k, v in batch.items():
        if isinstance(v, (np.ndarray, jax.Array)) and v.ndim >= 2:
            out[k] = jax.device_put(v, sh)
        else:
            out[k] = v
    return out
