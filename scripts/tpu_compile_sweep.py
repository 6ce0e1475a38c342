"""Compile-check the Pallas tile ladders on the REAL TPU.

The 16 MB scoped-vmem stack is invisible to interpret-mode CPU tests
(CLAUDE.md): a tile/scratch/layout change can ship a compile-time OOM that
only a real-TPU compile catches (the round-2 bug class: biallelic fits
with Lp in (8192, 24576] - BASELINE.md).  This script compiles
``admixture_fullstep`` and ``admixture_fullstep_biallelic`` at the LARGEST
admissible shape of every ``_FULLSTEP_TILES`` / ``_FULLSTEP_BI_TILES``
entry, in every kernel variant that changes VMEM pressure
(compute_t x with_miss), and exits nonzero if any entry fails.

Run it after ANY change to ops/kernels.py tile ladders, scratch shapes, or
kernel-body temporaries:

    python scripts/tpu_compile_sweep.py            # full sweep
    python scripts/tpu_compile_sweep.py --bi-only  # biallelic ladder only
    python scripts/tpu_compile_sweep.py --fast     # binding variants only

Uses jit(...).lower(ShapeDtypeStruct).compile() so no data crosses the
tunnel (remote compile rejects big constants with HTTP 413).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from multiclust_tpu.ops import kernels as kn


def _sds(shape, dtype):
    return jax.ShapeDtypeStruct(shape, dtype)


def compile_bi(ti, tl, b_max, Kp, compute_t, with_miss, emit_b=False,
               emit_a=False, chunk=None, project_eta=None,
               with_kmask=False):
    """``chunk``: None = plain resident; "mid"/"fin" = the chained
    one-pass chunk-mode bindings (admixture_fullstep_biallelic_chunked) -
    full-width arrays with static block-offset maps, a0 threading, and
    (mid) emit_a without emit_b.  Same VMEM pressure as resident at
    Lp=Lc; the compile verifies Mosaic accepts the offset index maps."""
    cap = b_max - b_max // 4 if chunk else b_max  # chunk: no p0n alias
    Lp = (cap // (Kp * 4)) // tl * tl
    if Lp == 0:
        return None
    I = 2 * ti
    f32, i8 = jnp.float32, jnp.int8
    n_chunks = 2 if chunk else 1
    Lf = n_chunks * Lp
    args = [_sds((I, Kp), f32), _sds((Kp, Lf), f32),
            _sds((I, Lf), i8), _sds((I, Lf), i8), _sds((I, 1), f32)]
    kw = dict(emit_b=emit_b, emit_a=emit_a)
    if with_miss:
        args.append(_sds((I, Lf), i8))
    elif chunk:
        args.append(None)
    if chunk == "mid":
        kw = dict(emit_b=emit_b, emit_a=True, chunk_idx=0, n_chunks=2)
    elif chunk == "fin":
        args.append(_sds((I, Kp), f32))  # a0 seed from the prior launch
        kw = dict(emit_b=emit_b, emit_a=emit_a, chunk_idx=1, n_chunks=2)
    if with_kmask:
        if not chunk:
            args.append(None)  # a0 slot
        args.append(_sds((Kp,), f32))
    kn.admixture_fullstep_biallelic.lower(
        *args, ti=ti, tl=tl, k_true=20, lb=1e-8, plb=1e-8, project=True,
        project_eta=project_eta, compute_t=compute_t, interpret=False,
        **kw).compile()
    return (I, Kp, Lp)


def compile_bi_streamed(ti, tl, Kp, compute_t, with_miss, emit_b=False,
                        emit_a=False):
    # VMEM pressure is Lp-independent (everything is tile-blocked); a
    # moderate Lp keeps the grid real without a huge HLO
    Lp = 16 * tl
    I = 2 * ti
    f32, i8 = jnp.float32, jnp.int8
    args = [_sds((I, Kp), f32), _sds((Kp, Lp), f32),
            _sds((I, Lp), i8), _sds((I, Lp), i8), _sds((I, 1), f32)]
    if with_miss:
        args.append(_sds((I, Lp), i8))
    kn.admixture_fullstep_biallelic_streamed.lower(
        *args, ti=ti, tl=tl, k_true=20, lb=1e-8, plb=1e-8, project=True,
        compute_t=compute_t, emit_b=emit_b, emit_a=emit_a,
        interpret=False).compile()
    return (I, Kp, Lp)


def compile_mix_resident(ti, Kp, with_x1):
    # largest Lp the budget model admits at this (ti, Kp)
    Lp = 0
    for cand in range(128, 1 << 18, 128):
        if kn._mix_resident_fits(ti, cand, Kp, with_x1):
            Lp = cand
        else:
            break
    if Lp == 0:
        return None
    I = 2 * ti
    f32, i8 = jnp.float32, jnp.int8
    args = [_sds((Kp, Lp), f32), _sds((I, Lp), i8)]
    kw = {}
    if with_x1:
        kw = dict(lp1=_sds((Kp, Lp), f32), x1=_sds((I, Lp), i8))
    kn.mixture_sweep_resident.lower(
        *args, _sds((1, Kp), f32), ti=ti, interpret=False,
        **kw).compile()
    return (I, Kp, Lp)


def compile_mix_twopass(ti, tl, Kp, with_x1):
    Lp = 8 * tl
    I = 2 * ti
    f32, i8 = jnp.float32, jnp.int8
    kw = {}
    if with_x1:
        kw = dict(lp1=_sds((Kp, Lp), f32), x1=_sds((I, Lp), i8))
    kn.mixture_fullstep_biallelic.lower(
        _sds((Kp, Lp), f32), _sds((I, Lp), i8), _sds((1, Kp), f32),
        row_valid=_sds((I,), jnp.bool_), ti=ti, tl=tl, plb=1e-8,
        ploidy=2, project=True, interpret=False, **kw).compile()
    return (I, Kp, Lp)


def compile_generic(ti, tl, b_max, Kp, compute_t, chain=False,
                    with_kmask=False):
    LMp = (b_max // (Kp * 4)) // tl * tl
    if LMp == 0:
        return None
    I = 2 * ti
    f32, i8 = jnp.float32, jnp.int8
    args = [_sds((I, Kp), f32), _sds((Kp, LMp), f32),
            _sds((I, LMp), i8), _sds((I, 1), f32)]
    kw = {}
    if chain:
        # jagged-M bucket chaining: a0-seeded accumulator + emit_a
        args.append(_sds((I, Kp), f32))
        kw = dict(emit_a=True)
    if with_kmask:  # dynamic-K runtime lane mask (round 5)
        if not chain:
            args.append(None)
        args.append(_sds((Kp,), f32))
    kn.admixture_fullstep.lower(
        *args, ti=ti, tl=tl, k_true=20, lb=1e-8, project=True,
        compute_t=compute_t, interpret=False, **kw).compile()
    return (I, Kp, LMp)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bi-only", action="store_true")
    ap.add_argument("--generic-only", action="store_true")
    ap.add_argument("--chunk-only", action="store_true",
                    help="chained chunk-mode bindings only (the one-pass "
                         "biobank-L path)")
    ap.add_argument("--fast", action="store_true",
                    help="binding variants only (compute_t=True, miss on)")
    args = ap.parse_args()
    if args.chunk_only:
        args.bi_only = True

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    if dev.platform == "cpu":
        print("WARNING: CPU backend cannot see the scoped-vmem limit; "
              "this sweep is only meaningful on a real TPU", file=sys.stderr)

    failures = []
    n_ok = 0

    if not args.generic_only:
        variants = [(True, True)] if args.fast else [
            (True, True), (True, False), (False, True), (False, False)]
        # emit_b = the mesh variant (B0/B1 as outputs for the cross-shard
        # psum, no in-kernel p update); (emit_b, emit_a) = the
        # loci-sharded variant (raw A out too).  Kp swept past the
        # production 32 lanes (advisor r3: intermediate lanes were
        # interpolated, not probed)
        emits = ((False, False), (True, False), (True, True))
        for ti, tl, b_max in kn._FULLSTEP_BI_TILES:
            # Kp=256 probed round 4; 512/768/1024 probed round 5
            # (_bi_k_fits carries the one calibrated exclusion)
            for Kp in ((32,) if args.fast
                       else (32, 64, 128, 256, 512, 768, 1024)):
                if not kn._bi_k_fits(ti, tl, Kp):
                    continue
                for compute_t, with_miss in variants:
                    emit_list = [(eb, ea, None) for eb, ea in
                                 (emits if compute_t and with_miss
                                  else ((False, False),))]
                    if compute_t and with_miss:
                        # dynamic-K bindings: runtime-kmask in-kernel
                        # Michelot (the production sweep path) and the
                        # project_eta=False XLA-relocation fallback
                        emit_list.append((False, False, "peta"))
                        emit_list.append((False, False, "kmask"))
                        # chained one-pass chunk bindings (biobank-L):
                        # non-final (emit_a, no a0) and final (a0 seeded)
                        emit_list += [(False, False, "mid"),
                                      (False, False, "fin"),
                                      (True, True, "fin")]
                    if args.chunk_only:
                        emit_list = [e for e in emit_list if e[2]]
                    for emit_b, emit_a, chunk in emit_list:
                        peta = chunk == "peta"
                        km = chunk == "kmask"
                        if peta or km:
                            chunk = None
                        # round-5 calibrated exclusions: chunk bindings
                        # verified to Kp=128; emit_b resident outputs
                        # tighten large-K admission
                        if chunk and Kp > 128:
                            continue
                        if emit_b and not kn._bi_k_fits(ti, tl, Kp,
                                                        emit_b=True):
                            continue
                        tag = (f"bi ti={ti} tl={tl} cap={b_max//1024}K "
                               f"Kp={Kp} t={int(compute_t)} "
                               f"miss={int(with_miss)} eb={int(emit_b)} "
                               f"ea={int(emit_a)} ch={chunk or '-'}"
                               f"{' peta' if peta else ''}"
                               f"{' kmask' if km else ''}")
                        t0 = time.time()
                        try:
                            shape = compile_bi(ti, tl, b_max, Kp,
                                               compute_t, with_miss,
                                               emit_b, emit_a, chunk,
                                               project_eta=(False if peta
                                                            else None),
                                               with_kmask=km)
                            if shape is None:
                                print(f"SKIP {tag} (no admissible Lp)")
                                continue
                            n_ok += 1
                            print(f"OK   {tag} shape={shape} "
                                  f"({time.time()-t0:.1f}s)")
                        except Exception as e:  # noqa: BLE001
                            failures.append(tag)
                            print(f"FAIL {tag}: {type(e).__name__}: "
                                  f"{str(e)[:300]}", file=sys.stderr)

    if not args.generic_only and not args.chunk_only:
        variants = [(True, True)] if args.fast else [
            (True, True), (True, False), (False, True), (False, False)]
        for ti, tl in kn._FULLSTEP_BI_STREAM_TILES:
            for Kp in ((32, 128) if args.fast
                       else (32, 64, 128, 256, 512, 768, 1024)):
                if not kn._stream_vmem_fits(ti, tl, Kp):
                    continue
                for compute_t, with_miss in variants:
                    emit_pairs = (((False, False), (True, False),
                                   (True, True))
                                  if compute_t and with_miss
                                  else ((False, False),))
                    for emit_b, emit_a in emit_pairs:
                        if emit_b and not kn._stream_vmem_fits(
                                ti, tl, Kp, emit_b=True):
                            continue
                        tag = (f"bi-stream ti={ti} tl={tl} Kp={Kp} "
                               f"t={int(compute_t)} miss={int(with_miss)} "
                               f"eb={int(emit_b)} ea={int(emit_a)}")
                        t0 = time.time()
                        try:
                            shape = compile_bi_streamed(
                                ti, tl, Kp, compute_t, with_miss, emit_b,
                                emit_a)
                            n_ok += 1
                            print(f"OK   {tag} shape={shape} "
                                  f"({time.time()-t0:.1f}s)")
                        except Exception as e:  # noqa: BLE001
                            failures.append(tag)
                            print(f"FAIL {tag}: {type(e).__name__}: "
                                  f"{str(e)[:300]}", file=sys.stderr)

    if not args.bi_only and not args.generic_only:
        # mixture kernels (C7): resident single-pass at the largest
        # admissible Lp per ti, plus the two-pass ladder
        for ti in kn._MIX_RESIDENT_TI:
            for Kp in ((32,) if args.fast else (32, 64, 128)):
                for with_x1 in (False, True):
                    tag = f"mix-res ti={ti} Kp={Kp} x1={int(with_x1)}"
                    t0 = time.time()
                    try:
                        shape = compile_mix_resident(ti, Kp, with_x1)
                        if shape is None:
                            print(f"SKIP {tag} (no admissible Lp)")
                            continue
                        n_ok += 1
                        print(f"OK   {tag} shape={shape} "
                              f"({time.time()-t0:.1f}s)")
                    except Exception as e:  # noqa: BLE001
                        failures.append(tag)
                        print(f"FAIL {tag}: {type(e).__name__}: "
                              f"{str(e)[:300]}", file=sys.stderr)
        for ti, tl in kn._MIX_TILES:
            for Kp in ((32,) if args.fast else (32, 128)):
                for with_x1 in (False, True):
                    if not kn._stream_vmem_fits(ti, tl, Kp,
                                                emit_b=with_x1):
                        continue
                    tag = f"mix-2p ti={ti} tl={tl} Kp={Kp} x1={int(with_x1)}"
                    t0 = time.time()
                    try:
                        shape = compile_mix_twopass(ti, tl, Kp, with_x1)
                        n_ok += 1
                        print(f"OK   {tag} shape={shape} "
                              f"({time.time()-t0:.1f}s)")
                    except Exception as e:  # noqa: BLE001
                        failures.append(tag)
                        print(f"FAIL {tag}: {type(e).__name__}: "
                              f"{str(e)[:300]}", file=sys.stderr)

    if not args.bi_only:
        variants_t = [True] if args.fast else [True, False]
        # advisor r3: probe the intermediate Kp lanes the admission model
        # (_fullstep_k_fits) interpolates between its calibration points
        gen_lanes = (kn.GENERIC_K_LANES if args.fast
                     else (32, 64, 96, 128, 160, 256, 512, 768, 1024))
        for ti, tl, b_max in kn._FULLSTEP_TILES:
            for Kp in gen_lanes:
                if not kn._fullstep_k_fits(ti, tl, Kp):
                    continue
                for compute_t in variants_t:
                    for chain, km in (((False, False), (True, False),
                                       (False, True), (True, True))
                                      if compute_t
                                      else ((False, False),)):
                        tag = (f"gen ti={ti} tl={tl} cap={b_max//1024}K "
                               f"Kp={Kp} t={int(compute_t)} "
                               f"chain={int(chain)}"
                               f"{' kmask' if km else ''}")
                        t0 = time.time()
                        try:
                            shape = compile_generic(ti, tl, b_max, Kp,
                                                    compute_t, chain, km)
                            if shape is None:
                                print(f"SKIP {tag} (no admissible LMp)")
                                continue
                            n_ok += 1
                            print(f"OK   {tag} shape={shape} "
                                  f"({time.time()-t0:.1f}s)")
                        except Exception as e:  # noqa: BLE001
                            failures.append(tag)
                            print(f"FAIL {tag}: {type(e).__name__}: "
                                  f"{str(e)[:300]}", file=sys.stderr)

    print(f"\n{n_ok} compiled OK, {len(failures)} failed")
    if failures:
        for f in failures:
            print(f"  FAILED: {f}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
