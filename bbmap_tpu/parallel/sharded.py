"""Multi-chip execution: mesh construction and sharded alignment steps.

TPU-native replacement for the reference's (stubbed) MPI distributed
stream layer (reference: stream/ConcurrentReadInputStreamD.java:17,
align2/Shared.java:33-38; SURVEY.md §2.11 P5/§5.8). Instead of
master-broadcast read batches over MPI ranks, read batches are sharded
across a ``jax.sharding.Mesh``:

- axis "data": batch data parallelism — each chip scores its shard of the
  candidate batch (reference mechanism P1: thread data parallelism)
- axis "index": genome/index block sharding — each shard scores reads
  against its genome block and the best site is combined with a max
  collective (reference mechanism P4: CHROMS_PER_BLOCK index blocks,
  align2/BBIndex.java:616-642)

Stats merge with psum (the reference's end-of-run histogram merge,
align2/ReadStats.java:208-256, becomes a collective).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import msa_jax


def make_mesh(n_data: Optional[int] = None,
              n_index: int = 1) -> Mesh:
    """Build a (data, index) mesh over the available devices."""
    devs = np.array(jax.devices())
    if n_data is None:
        n_data = len(devs) // n_index
    devs = devs[: n_data * n_index].reshape(n_data, n_index)
    return Mesh(devs, axis_names=("data", "index"))


def sharded_score_step(mesh: Mesh, R: int, C: int):
    """Jitted, mesh-sharded candidate-scoring step.

    Inputs: reads (B, R) uint8, refs (B, 2, C) uint8 — two index-shard
    windows per read (stand-in for per-genome-block candidates); the
    "index" axis shards the window dimension. Returns per-read best
    (score, shard) plus a globally reduced mapped count — the all-gather /
    all-reduce of per-shard best scores described in SURVEY.md §5.8.
    """
    data_sharding = NamedSharding(mesh, P("data", None))
    refs_sharding = NamedSharding(mesh, P("data", "index", None))
    out_sharding = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def step(reads, refs, min_score):
        # score each read against each index shard's window
        def per_shard(refs_s):
            s, _c, _st = jax.vmap(
                lambda rd, rf: msa_jax.msa_score_single(rd, rf, R, C))(
                    reads, refs_s)
            return s
        scores = jax.vmap(per_shard, in_axes=1, out_axes=1)(refs)  # (B, S)
        best = jnp.max(scores, axis=1)
        best_shard = jnp.argmax(scores, axis=1)
        n_mapped = jnp.sum((best >= min_score).astype(jnp.int32))
        return best, best_shard, n_mapped

    return jax.jit(
        step,
        in_shardings=(data_sharding, refs_sharding, None),
        out_shardings=(out_sharding, out_sharding, repl))


def shard_batch(mesh: Mesh, arr: np.ndarray, spec: P) -> jax.Array:
    return jax.device_put(arr, NamedSharding(mesh, spec))
