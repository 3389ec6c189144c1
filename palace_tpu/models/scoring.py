"""Contig-scoring pipeline stage: FASTA → ``node_scores.out``.

The reference stage (palace:462-470 → phage_scoring.py main) encodes
contigs in a multiprocessing pool and runs torch inference in
batch-64 chunks, writing ``contig\\tP(phage)`` lines
(phage_scoring.py:205-218).

Here encoding *and* inference run on device: sequences are packed
into padded batches, encoded with the MXU one-hot matmul kernel, and
scored with the pure-JAX GCN, optionally sharded batch-parallel over
a mesh's ``data`` axis.
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import numpy as np

from palace_tpu.io.fasta import iter_fasta
from palace_tpu.models.gcn import (
    DEFAULT_CONFIG,
    GCNConfig,
    Params,
    model_inputs_from_features,
    phage_probabilities,
)
from palace_tpu.ops.encoder import (
    encode_batch,
    features_from_packed,
    pack_codes,
    seqs_to_code_batch,
)
from palace_tpu.parallel.mesh import data_sharding
from palace_tpu.utils.logging import get_logger
from palace_tpu.utils.timers import GLOBAL_METRICS

logger = get_logger("palace")


def resolve_dtype(name: Optional[str]):
    """Config dtype string → jnp dtype, or None for the f32 default
    (no cast, params used as loaded)."""
    if not name or name in ("float32", "f32", "fp32"):
        return None
    import jax.numpy as jnp

    aliases = {"bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
               "float16": jnp.float16, "f16": jnp.float16}
    if name not in aliases:
        raise ValueError(f"unsupported score dtype {name!r}")
    return aliases[name]


import functools

import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("cfg", "dtype"))
def _score_codes(params: Params, packed: jnp.ndarray, n_codes: jnp.ndarray,
                 seq_lens: jnp.ndarray, cfg: GCNConfig, dtype=None) -> jnp.ndarray:
    """Fused encode+score: ONE device dispatch per batch.  The host ships
    2-bit-packed base codes (16× less transfer than int32 3-mer locs —
    the wire, not the MXU, bounds throughput behind a device relay)."""
    feats = features_from_packed(packed, n_codes, seq_lens)
    if dtype is not None:
        feats = feats.astype(dtype)
    from palace_tpu.models.gcn import forward, model_inputs_from_features as _inputs

    x_p, x_f = _inputs(feats, cfg)
    return forward(params, x_p, x_f, cfg)[:, 1]


@functools.partial(jax.jit, static_argnames=("cfg", "dtype"))
def _score_codes_k(params: Params, packed: jnp.ndarray, n_codes: jnp.ndarray,
                   seq_lens: jnp.ndarray, cfg: GCNConfig, dtype=None) -> jnp.ndarray:
    """K batches per dispatch: inputs carry a leading K dim; ``lax.map``
    runs the fused scorer per batch with the weights resident on device.

    One host→device transfer and one dispatch move K batches, amortising
    the per-put round-trip that dominates on relay-tunneled devices
    (benchmarks/wire_diagnosis.json: ~29 ms RTT vs ~14 ms device
    compute per batch).  Params must be an argument, not a closure
    capture — captured arrays become HLO constants and the weights blow
    the remote-compile payload limit.
    """
    def body(args):
        pk, nc, ln = args
        return _score_codes.__wrapped__(params, pk, nc, ln, cfg, dtype)

    return jax.lax.map(body, (packed, n_codes, seq_lens))


def pack_batch(seqs: Sequence[str]):
    """Host-side: sequences → (packed uint8, n_codes, orig_lens) arrays
    ready for ``_score_codes``.  Native one-scan packer when built."""
    from palace_tpu.ops.encoder import pack_contigs

    return pack_contigs(seqs)


def score_codes(params: Params, seqs: Sequence[str],
                cfg: GCNConfig = DEFAULT_CONFIG, dtype=None) -> jax.Array:
    """Score raw sequences via the fused packed path (single dispatch)."""
    packed, n_codes, lens = pack_batch(seqs)
    return _score_codes(params, jnp.asarray(packed), jnp.asarray(n_codes),
                        jnp.asarray(lens), cfg, dtype)


def _dispatch(params, payload, cfg, dtype, mesh, fused, encode_fn):
    """Ship one prepared batch to the device and dispatch the scorer
    (async — returns the un-fetched device array)."""
    if fused:
        packed, n_codes, lens = payload
        packed, n_codes, lens = (jnp.asarray(packed), jnp.asarray(n_codes),
                                 jnp.asarray(lens))
        if mesh is not None:
            packed = jax.device_put(packed, data_sharding(mesh, packed.ndim))
            n_codes = jax.device_put(n_codes, data_sharding(mesh, 1))
            lens = jax.device_put(lens, data_sharding(mesh, 1))
        return _score_codes(params, packed, n_codes, lens, cfg, dtype)
    feats = encode_fn(payload)
    if dtype is not None:
        feats = feats.astype(dtype)
    if mesh is not None:
        feats = jax.device_put(feats, data_sharding(mesh, feats.ndim))
    return phage_probabilities(params, feats, cfg)


def _batches(items: Iterator[Tuple[str, str]], size: int) -> Iterator[List[Tuple[str, str]]]:
    chunk: List[Tuple[str, str]] = []
    for item in items:
        chunk.append(item)
        if len(chunk) == size:
            yield chunk
            chunk = []
    if chunk:
        yield chunk


def _stack_group(payloads, widths):
    """Stack K (packed, n_codes, lens) batches along a leading K dim,
    zero-padding packed rows to the group's max width (bytes beyond
    ``n_codes`` are masked out on device, so zero-padding is exact)."""
    w = max(widths)
    padded = [np.pad(pl[0], ((0, 0), (0, w - pl[0].shape[1])))
              if pl[0].shape[1] < w else pl[0] for pl in payloads]
    return (np.stack(padded),
            np.stack([pl[1] for pl in payloads]),
            np.stack([pl[2] for pl in payloads]))


def score_sequences(
    params: Params,
    named_seqs: Sequence[Tuple[str, str]],
    cfg: GCNConfig = DEFAULT_CONFIG,
    batch_size: int = 64,
    mesh=None,
    encode_fn=None,
    dtype=None,
    fuse_k: int = 1,
) -> List[Tuple[str, float]]:
    """Score (name, seq) pairs → (name, P(phage)).

    Batches are padded to ``batch_size`` (static shapes for jit); when
    a mesh is given the feature batch is sharded over its data axis.
    ``dtype`` (e.g. ``jnp.bfloat16``) casts params once and each
    feature batch — halves HBM weight traffic, which is what bounds
    throughput at small batch (benchmarks/ANALYSIS.md).

    ``fuse_k`` > 1 ships K packed batches per transfer and dispatches
    one ``lax.map`` over them (weights stay resident) — amortises the
    per-put round-trip on relay-tunneled devices.  Requires the fused
    path (``encode_fn is None``) and no mesh.
    """
    fused = encode_fn is None
    if fuse_k > 1 and (not fused or mesh is not None):
        raise ValueError("fuse_k > 1 requires the fused packed path "
                         "(encode_fn=None) and mesh=None")
    if dtype is not None:
        params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
    if mesh is not None:
        # batches shard over the data axis → round batch up to a multiple
        ndata = mesh.shape.get("data", 1)
        batch_size = ((batch_size + ndata - 1) // ndata) * ndata
    t0 = time.perf_counter()
    n = 0
    # Two-stage software pipeline: a single background thread packs
    # batch i+1 while the main thread ships/dispatches batch i (the
    # native packer and numpy release the GIL, so the overlap is real),
    # and the device queue runs a further batch behind — so host pack,
    # host→device wire, and device compute all overlap.  Results are
    # fetched once at the end.
    def prepare(chunk):
        names = [name for name, _ in chunk]
        seqs = [seq for _, seq in chunk]
        pad = batch_size - len(seqs)
        if pad:
            seqs = seqs + ["A" * 4] * pad
        return names, (pack_batch(seqs) if fused else seqs)

    from concurrent.futures import ThreadPoolExecutor

    # pending entries: (list-of-name-lists, device array of shape (B,)
    # per-batch or (K, B) for a fused group)
    pending: List[Tuple[List[List[str]], jax.Array]] = []
    group: List[Tuple[List[str], tuple]] = []

    def flush_group():
        if not group:
            return 0
        if len(group) == 1 or fuse_k == 1:
            total = 0
            for names, payload in group:
                pending.append(([names], _dispatch(params, payload, cfg, dtype,
                                                   mesh, fused, encode_fn)))
                total += len(names)
            group.clear()
            return total
        payloads = [pl for _, pl in group]
        stacked = _stack_group(payloads, [pl[0].shape[1] for pl in payloads])
        probs = _score_codes_k(params, jnp.asarray(stacked[0]),
                               jnp.asarray(stacked[1]), jnp.asarray(stacked[2]),
                               cfg, dtype)
        names_lists = [names for names, _ in group]
        pending.append((names_lists, probs))
        total = sum(len(ns) for ns in names_lists)
        group.clear()
        return total

    with ThreadPoolExecutor(max_workers=1) as pool:
        fut = None
        for chunk in _batches(iter(named_seqs), batch_size):
            nxt = pool.submit(prepare, chunk)
            if fut is None:
                fut = nxt
                continue
            names, payload = fut.result()
            fut = nxt
            group.append((names, payload))
            if len(group) == fuse_k:
                n += flush_group()
        if fut is not None:
            names, payload = fut.result()
            group.append((names, payload))
        n += flush_group()
    results: List[Tuple[str, float]] = []
    for names_lists, probs in pending:
        host = np.asarray(probs)
        if host.ndim == 1:
            host = host[None, :]
        for k, names in enumerate(names_lists):
            results.extend((nm, float(p))
                           for nm, p in zip(names, host[k, : len(names)]))
    GLOBAL_METRICS.record("gcn.score", time.perf_counter() - t0, items=n, unit="contigs")
    return results


def write_scores(path: str | Path, scores: Sequence[Tuple[str, float]]) -> None:
    """``contig\\tprob`` lines (phage_scoring.py:213-216 format: raw
    float repr, no trailing blank line)."""
    with open(path, "w") as fh:
        for i, (name, p) in enumerate(scores):
            if i:
                fh.write("\n")
            fh.write(f"{name}\t{np.float32(p)}")


def read_scores(path: str | Path) -> Dict[str, float]:
    out: Dict[str, float] = {}
    with open(path) as fh:
        for line in fh:
            parts = line.strip().split("\t")
            if len(parts) >= 2:
                out[parts[0]] = float(parts[1])
    return out


def score_fasta(
    params: Params,
    fasta_path: str | Path,
    out_path: str | Path,
    cfg: GCNConfig = DEFAULT_CONFIG,
    batch_size: int = 64,
    mesh=None,
    encode_fn=None,
    dtype=None,
    fuse_k: int = 1,
) -> int:
    """Full stage: assembly FASTA → node_scores.out.  Returns #contigs."""
    scores = score_sequences(
        params, list(iter_fasta(fasta_path)), cfg, batch_size, mesh, encode_fn,
        dtype=dtype, fuse_k=fuse_k,
    )
    write_scores(out_path, scores)
    logger.info("Scored %d contigs → %s", len(scores), out_path)
    return len(scores)
