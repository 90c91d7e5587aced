"""Capacity planner: where will this config's memory go, and which scaling
path does it need? (No allocation — everything is computed from the encoder
metadata `HashGridEncoding` derives statically.)

The README's scaling matrix names a path per constraint (streaming when the
dataset outgrows HBM, `--shard_tables` when the TABLE does, `--remat` when
activations do, bf16 export for serving artifacts). This module turns that
prose into a tool: feed it the same flags the launcher takes and it prints
per-level table sizes, training-step residency, the sharding layout
`plan_table_sharding` would choose, and a recommendation per constraint.

    python -m mri_interpolation_tpu.plan --n_levels 3 \
        --n_features_per_level 8 --log2_hashmap_size 23 \
        --base_resolution 64,64,2 --finest_resolution 352,352,90 \
        --volume_shape 352,352,6,15 --batch_size 50000 --n_devices 8

All numbers are ESTIMATES of steady-state residency (params, optimizer
state, dataset, per-step activations); XLA's transient buffers and fusion
decisions add real but config-dependent slack on top.

Reference counterpart: none — the reference sizes tables implicitly inside
tinycudann (encoding.py:176,319-321) and leaves the user to discover OOMs
at runtime.
"""

from __future__ import annotations

import argparse
import json
from typing import Optional, Sequence, Union

import numpy as np

from .encodings.hashgrid import HashGridEncoding

__all__ = ["plan_run", "step_roofline", "main"]

# Public per-chip peaks (jax-ml.github.io/scaling-book, Google v5e spec
# sheet): HBM bandwidth and MXU matmul throughput. f32 matmuls run the MXU
# in multi-pass mode at ~1/4 of the bf16 rate.
CHIPS = {
    "v5e": {"hbm_bytes_per_s": 819e9, "bf16_flops": 1.97e14,
            "f32_flops": 4.9e13},
}


def _decoder_param_count(enc_out: int, dim_hidden: int, n_layers: int,
                         dim_out: int, decoder: str) -> int:
    widths = [enc_out] + [dim_hidden] * (n_layers - 1) + [dim_out]
    n = sum((widths[i] + 1) * widths[i + 1] for i in range(n_layers))
    if decoder == "norm":
        n += 2 * sum(widths[1:])            # scale+bias on every block
    elif decoder == "norm_proper":
        n += 2 * sum(widths[1:-1])          # hidden blocks only
    return n


def plan_run(
    dim_in: int,
    n_levels: int = 4,
    n_features_per_level: int = 1,
    log2_hashmap_size: int = 23,
    base_resolution: Union[int, Sequence[int]] = (64, 64, 5),
    finest_resolution: Union[int, Sequence[int], None] = (352, 352, 15),
    per_level_scale: Optional[float] = None,
    growth: str = "reference",
    storage: str = "auto",
    dim_hidden: int = 64,
    n_layers: int = 2,
    dim_out: int = 1,
    decoder: str = "norm",
    batch_size: int = 10000,
    volume_shape: Optional[Sequence[int]] = None,
    row_fraction: float = 1.0,   # fraction of voxels kept (--undersample_pct)
    n_devices: int = 1,
    optimizer: str = "adam",
    remat: bool = False,
    hbm_bytes: float = 16e9,
) -> dict:
    """Estimate the memory layout of a HashMLP run and pick scaling paths.

    Returns a dict with ``levels`` (per-level rows/bytes/storage),
    ``bytes`` (table, decoder, optimizer, dataset, activations, step totals),
    ``sharding`` (per-device table bytes under ``plan_table_sharding`` when
    ``n_devices > 1``), ``serving`` (artifact sizes), and
    ``recommendations`` (constraint -> launcher flag)."""
    enc = HashGridEncoding(
        dim=dim_in, n_levels=n_levels,
        n_features_per_level=n_features_per_level,
        log2_hashmap_size=log2_hashmap_size,
        base_resolution=base_resolution, finest_resolution=finest_resolution,
        per_level_scale=per_level_scale, growth=growth, storage=storage,
    )
    F = n_features_per_level
    levels = []
    for l in range(n_levels):
        rows = int(enc.level_sizes[l])
        levels.append({
            "level": l,
            "resolution": [int(r) for r in enc.level_resolutions[l]],
            "storage": "dense" if bool(enc.level_dense[l]) else "hashed",
            "rows": rows,
            "bytes": rows * F * 4,
        })
    table_bytes = enc.total_size * F * 4
    dec_params = _decoder_param_count(enc.output_dim, dim_hidden, n_layers,
                                      dim_out, decoder)
    params_bytes = table_bytes + dec_params * 4
    opt_mult = 2 if optimizer.startswith("adam") else 0
    opt_bytes = opt_mult * params_bytes
    grad_bytes = params_bytes                 # transient, but peak-relevant

    # Per-step activations (forward residency the backward keeps alive):
    # packed-gather path per (voxel, level, corner): int32 ids + F f32
    # features + interp weights; decoder: every hidden width once. remat
    # drops the decoder/encoder intermediates to ~the largest single layer.
    corners = 2 ** dim_in
    enc_act = batch_size * n_levels * corners * (4 + F * 4 + 4)
    widths = [enc.output_dim] + [dim_hidden] * (n_layers - 1) + [dim_out]
    dec_act = batch_size * sum(widths) * 4
    act_bytes = (max(enc_act, dec_act) if remat else enc_act + dec_act)

    dataset_bytes = None
    if volume_shape is not None:
        n_vox = int(np.prod(volume_shape) * row_fraction)
        # device-resident (coords f32 dim_in+, values f32): the default
        # Trainer layout (io/volume.py dataset_from_array)
        dataset_bytes = n_vox * (len(volume_shape) + 1) * 4

    step_bytes = params_bytes + opt_bytes + grad_bytes + act_bytes
    total_bytes = step_bytes + (dataset_bytes or 0)

    sharding = None
    if n_devices > 1:
        from .parallel.sharded_table import plan_table_sharding

        plan = plan_table_sharding(enc, n_devices)
        per_dev_rows = [int(sum(ln for (_, _, ln) in slot)) for slot in plan.slots]
        sharding = {
            "n_devices": n_devices,
            "per_device_table_bytes": [r * F * 4 for r in per_dev_rows],
            "max_device_table_bytes": max(per_dev_rows) * F * 4,
            "split_levels": sorted({l for slot in plan.slots for (l, s, ln) in slot
                                    if ln > 0 and ln < int(enc.level_sizes[l])}),
        }

    serving = {
        # export_evaluator_bytes artifacts: tables at f32 vs bf16
        # (infer/export.py), decoder always f32
        "artifact_f32_bytes": params_bytes,
        "artifact_bf16_table_bytes": enc.total_size * F * 2 + dec_params * 4,
    }

    recommendations = []
    if total_bytes > hbm_bytes and dataset_bytes and dataset_bytes > 0.25 * hbm_bytes:
        shard = int(batch_size * max(4, n_devices))
        recommendations.append({
            "constraint": f"dataset residency {dataset_bytes/1e9:.2f} GB",
            "path": f"--stream_shard_voxels {shard} (out-of-core shard rotation; "
                    "io.nifti.load_memmap if host RAM is also short)"})
    table_budget = hbm_bytes - act_bytes - (dataset_bytes or 0)
    if (1 + opt_mult + 1) * params_bytes > table_budget:
        recommendations.append({
            "constraint": f"table+optimizer {((1+opt_mult+1)*params_bytes)/1e9:.2f} GB",
            "path": "--shard_tables (dense levels row-range-split; "
                    "see 'sharding' for the per-device bytes)"})
    if act_bytes > 0.25 * hbm_bytes and not remat:
        recommendations.append({
            "constraint": f"activations {act_bytes/1e9:.2f} GB/step",
            "path": "--remat (recompute forward in backward) or smaller --batch_size"})
    if not recommendations:
        recommendations.append({"constraint": "none",
                                "path": "fits a single chip as configured"})

    return {
        "levels": levels,
        "bytes": {
            "table": table_bytes,
            "decoder_params": dec_params * 4,
            "optimizer_state": opt_bytes,
            "gradients": grad_bytes,
            "activations_per_step": act_bytes,
            "dataset": dataset_bytes,
            "step_total": step_bytes,
            "total": total_bytes,
            "hbm_budget": hbm_bytes,
        },
        "sharding": sharding,
        "serving": serving,
        "recommendations": recommendations,
    }


def step_roofline(
    dim_in: int,
    n_levels: int = 4,
    n_features_per_level: int = 1,
    log2_hashmap_size: int = 23,
    base_resolution: Union[int, Sequence[int]] = (64, 64, 5),
    finest_resolution: Union[int, Sequence[int], None] = (352, 352, 15),
    per_level_scale: Optional[float] = None,
    growth: str = "reference",
    storage: str = "auto",
    dim_hidden: int = 64,
    n_layers: int = 2,
    dim_out: int = 1,
    decoder: str = "norm",
    batch_size: int = 10000,
    optimizer: str = "adam",
    chip: str = "v5e",
    measured_steps_per_sec: Optional[float] = None,
    measured_gather_ns: Optional[float] = None,
    measured_scatter: Optional[dict] = None,
) -> dict:
    """Roofline model of ONE optimizer step of the HashMLP trainer.

    Counts the HBM bytes moved and the FLOPs issued per training step from
    the same static encoder metadata ``plan_run`` uses, divides by the
    chip's public peaks (``CHIPS``), and reports the two time floors — the
    step can be no faster than max(bytes/BW, flops/peak). When
    ``measured_steps_per_sec`` is given, also reports the achieved fraction
    of the binding roofline and the implied dispatch/latency overhead.

    Byte accounting (f32 training throughout):
      encode fwd: 2^d corner gathers per (voxel, level) of F features +
        the batch coordinates once;
      encode bwd: scatter-add of the same feature bytes (read+write);
      decoder: weight reads fwd + 2x bwd, activation write fwd / read bwd;
      optimizer: dense Adam over every parameter — 3 reads (p, m, v) +
        3 writes, the dominant term for large tables (the single-scatter
        VJP design updates the whole table each step; tcnn pays the same).

    FLOP accounting: decoder matmuls fwd + 2x bwd (dL/dx and dL/dW);
    multilinear interpolation weight products; ~10 FLOPs/param for Adam.
    """
    enc = HashGridEncoding(
        dim=dim_in, n_levels=n_levels,
        n_features_per_level=n_features_per_level,
        log2_hashmap_size=log2_hashmap_size,
        base_resolution=base_resolution, finest_resolution=finest_resolution,
        per_level_scale=per_level_scale, growth=growth, storage=storage,
    )
    F = n_features_per_level
    B = batch_size
    d = dim_in
    corners = 2 ** d
    table_rows = int(enc.total_size)
    dec_params = _decoder_param_count(enc.output_dim, dim_hidden, n_layers,
                                      dim_out, decoder)
    n_params = table_rows * F + dec_params

    # ---- bytes -----------------------------------------------------------
    gather_bytes = B * n_levels * corners * F * 4          # fwd feature reads
    scatter_bytes = 2 * gather_bytes                       # bwd read+write
    coord_bytes = B * (d + 1) * 4                          # batch (x, y)
    widths = [enc.output_dim] + [dim_hidden] * (n_layers - 1) + [dim_out]
    act_bytes = 2 * B * sum(widths) * 4                    # write fwd + read bwd
    weight_bytes = 3 * dec_params * 4                      # fwd + 2 bwd passes
    opt_mult = 6 if optimizer.startswith("adam") else 2    # r/w p (+ m, v)
    opt_bytes = opt_mult * n_params * 4
    bytes_total = (gather_bytes + scatter_bytes + coord_bytes + act_bytes
                   + weight_bytes + opt_bytes)

    # ---- flops -----------------------------------------------------------
    mm = sum(widths[i] * widths[i + 1] for i in range(n_layers))
    dec_flops = 3 * 2 * B * mm                             # fwd + 2 bwd matmuls
    interp_flops = 2 * B * n_levels * corners * (d + 2 * F)
    opt_flops = 10 * n_params
    flops_total = dec_flops + interp_flops + opt_flops

    peaks = CHIPS[chip]
    t_bw = bytes_total / peaks["hbm_bytes_per_s"]
    t_mxu = flops_total / peaks["f32_flops"]
    t_floor = max(t_bw, t_mxu)

    # Random-access (transaction) accounting: on TPU a 4-byte random gather
    # costs a full transaction (~6-9 ns measured in isolation on v5e via
    # XLA's gather; see scripts/experiments.py --roofline microbenchmark),
    # so hash-encode workloads are bound by ACCESS COUNT, not by the
    # sequential HBM byte rate the classic roofline uses. Count the random
    # accesses per step: per (voxel, level) the cell-view levels do one
    # row-gather, the packed levels 2^d element-gathers; the backward
    # scatter-adds into the same locations.
    #
    # Scatter pricing (round-5 reconciliation — the old model priced every
    # backward access at the GATHER cost, contradicting the repo's own
    # scatter measurements): measured on this chip, narrow 4-byte
    # scatter-adds cost ~9-12 ns/ELEMENT at every destination size (bf16
    # identical -> transaction-driven), while WIDE row scatters (F>1) pay
    # ~81 ns/id once the destination exceeds ~2^18 rows (~17.8 below). The
    # encoder's backward runs at the narrow rate by construction: F=1
    # tables scatter narrow, and F in (2..5] big-table big-batch scatters
    # use the flat element layout (encodings/hashgrid.py bwd). The floor
    # therefore prices the packed scatter at ids*F narrow elements; the
    # regime where the implementation must fall back to a wide scatter
    # (few ids, where the flat expansion overhead loses) is reported as
    # ``scatter_layout`` so the table can say which price the step pays.
    n_cv = int(np.sum(enc.level_cellview))
    n_packed = n_levels - n_cv
    fwd_accesses = B * (n_cv + n_packed * corners)
    packed_ids = B * n_packed * corners
    random_accesses = 2 * fwd_accesses        # legacy field (kept for tools)

    out = {
        "chip": chip,
        "bytes_per_step": {
            "encode_gather": gather_bytes,
            "encode_scatter": scatter_bytes,
            "decoder_weights": weight_bytes,
            "activations": act_bytes,
            "optimizer": opt_bytes,
            "coords": coord_bytes,
            "total": bytes_total,
        },
        "flops_per_step": {
            "decoder": dec_flops,
            "interp": interp_flops,
            "optimizer": opt_flops,
            "total": flops_total,
        },
        "random_accesses_per_step": random_accesses,
        "floor_s": {
            "hbm": t_bw,
            "mxu_f32": t_mxu,
            "binding": "hbm" if t_bw >= t_mxu else "mxu",
            "predicted_step_s": t_floor,
            "predicted_steps_per_sec": 1.0 / t_floor,
        },
    }
    if measured_gather_ns is not None:
        # The binding floor for gather-heavy steps: every random access pays
        # the measured per-transaction cost, everything sequential rides the
        # byte rate, compute rides the MXU — take the max.
        seq_bytes = bytes_total - gather_bytes - scatter_bytes
        if measured_scatter is not None:
            s = measured_scatter
            cliff = int(s.get("cliff_rows", 1 << 18))
            crossover = int(s.get("flat_crossover_ids", 1 << 18))
            narrow = float(s["narrow_ns"])
            # packed backward: one fused scatter into the rows_total-row
            # table. Floor = achievable narrow-element pricing (ids * F);
            # record which layout the implementation actually selects.
            t_packed = packed_ids * F * narrow * 1e-9
            if F == 1:
                layout = "narrow"
            elif 1 < F <= 5 and table_rows > cliff and packed_ids >= crossover:
                layout = "flat"
            else:
                layout = "wide"
                wide_ns = float(s["wide_above_ns" if table_rows > cliff
                                  else "wide_below_ns"])
                t_packed = packed_ids * wide_ns * 1e-9
            # cell-view backward: B row-scatters per cv level into sub-cliff
            # destinations (cell-view levels are < 2^18 cells by
            # construction) + the view-adjoint's sequential pass over the
            # grid (counted in seq below via the cv view bytes).
            cv_ns = float(s.get("wide_below_ns", narrow)) if F * corners > 1 else narrow
            t_cv_bwd = B * n_cv * cv_ns * 1e-9
            # cell-view build (fwd) + adjoint (bwd): sequential traffic over
            # each cv level's (cells, 2^d * F) view — previously unpriced
            cv_view_bytes = 2 * sum(
                int(np.prod(enc.level_resolutions[l])) * corners * F * 4
                for l in range(n_levels) if enc.level_cellview[l])
            t_tx = (fwd_accesses * measured_gather_ns * 1e-9
                    + t_packed + t_cv_bwd
                    + (seq_bytes + cv_view_bytes) / peaks["hbm_bytes_per_s"])
            out["scatter_pricing"] = {
                "layout": layout,
                "packed_ids": packed_ids,
                "packed_scatter_s": t_packed,
                "cellview_bwd_s": t_cv_bwd,
                "narrow_ns": narrow,
            }
        else:
            t_tx = (random_accesses * measured_gather_ns * 1e-9
                    + seq_bytes / peaks["hbm_bytes_per_s"])
        t_tx = max(t_tx, t_mxu)
        out["floor_s"]["transaction"] = t_tx
        out["floor_s"]["measured_gather_ns"] = measured_gather_ns
    if measured_steps_per_sec:
        t_meas = 1.0 / measured_steps_per_sec
        out["measured"] = {
            "steps_per_sec": measured_steps_per_sec,
            "step_s": t_meas,
            "fraction_of_roofline": t_floor / t_meas,
            # everything the roofline doesn't account for: kernel launch /
            # tunnel dispatch latency, non-overlapped transposes, XLA
            # transients. For small batches this dominates.
            "overhead_s": t_meas - t_floor,
        }
        if measured_gather_ns is not None:
            out["measured"]["fraction_of_transaction_roofline"] = (
                out["floor_s"]["transaction"] / t_meas)
    return out


def _tuple_arg(s: str):
    s = s.strip()
    if not s:
        return None
    parts = [p for p in s.replace("(", "").replace(")", "").split(",") if p.strip()]
    vals = tuple(int(p) for p in parts)
    return vals[0] if len(vals) == 1 else vals


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--dim_in", type=int, default=3)
    ap.add_argument("--n_levels", type=int, default=4)
    ap.add_argument("--n_features_per_level", type=int, default=1)
    ap.add_argument("--log2_hashmap_size", type=int, default=23)
    ap.add_argument("--base_resolution", type=_tuple_arg, default=(64, 64, 5))
    ap.add_argument("--finest_resolution", type=_tuple_arg, default=(352, 352, 15))
    ap.add_argument("--per_level_scale", type=float, default=None)
    ap.add_argument("--growth", default="reference")
    ap.add_argument("--storage", default="auto")
    ap.add_argument("--dim_hidden", type=int, default=64)
    ap.add_argument("--n_layers", type=int, default=2)
    ap.add_argument("--dim_out", type=int, default=1)
    ap.add_argument("--decoder", default="norm")
    ap.add_argument("--batch_size", type=int, default=10000)
    ap.add_argument("--volume_shape", type=_tuple_arg, default=None)
    ap.add_argument("--n_devices", type=int, default=1)
    ap.add_argument("--optimizer", default="adam")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--hbm_gb", type=float, default=16.0,
                    help="per-chip HBM budget (v5e: 16)")
    ap.add_argument("--roofline", action="store_true",
                    help="also print the per-step roofline model "
                         "(bytes, FLOPs, time floors vs chip peaks)")
    ap.add_argument("--measured_steps_per_sec", type=float, default=None,
                    help="with --roofline: print predicted step time next "
                         "to this measured rate + achieved fraction")
    ap.add_argument("--measured_gather_ns", type=float, default=None,
                    help="with --roofline: per-transaction random-gather "
                         "cost (scripts/experiments.py --roofline measures "
                         "~9.1 on v5e); enables the transaction floor")
    ap.add_argument("--measured_scatter_json", default=None,
                    help="with --measured_gather_ns: scatter pricing dict "
                         'as JSON, e.g. \'{"narrow_ns": 14.3, '
                         '"wide_below_ns": 17.5, "wide_above_ns": 80.9}\' '
                         "(the --roofline microbenchmark's output); prices "
                         "the backward at measured scatter cost")
    args = ap.parse_args(argv)
    kw = vars(args).copy()
    kw["hbm_bytes"] = kw.pop("hbm_gb") * 1e9
    roofline = kw.pop("roofline")
    measured = kw.pop("measured_steps_per_sec")
    gather_ns = kw.pop("measured_gather_ns")
    scatter_json = kw.pop("measured_scatter_json")
    out = plan_run(**kw)
    if roofline or measured:
        rl_kw = {k: kw[k] for k in (
            "dim_in", "n_levels", "n_features_per_level", "log2_hashmap_size",
            "base_resolution", "finest_resolution", "per_level_scale",
            "growth", "storage", "dim_hidden", "n_layers", "dim_out",
            "decoder", "batch_size", "optimizer")}
        out["roofline"] = step_roofline(
            measured_steps_per_sec=measured,
            measured_gather_ns=gather_ns,
            measured_scatter=(json.loads(scatter_json)
                              if scatter_json else None),
            **rl_kw)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
