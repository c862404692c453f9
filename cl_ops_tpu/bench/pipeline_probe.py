"""Stripped-stage timing of the composite query pipelines (q1, rollup).

VERDICT r4 weak #1: q1 (38.2 Mrows/s) and rollup (58.7) measure 3-4x below
what their own component rates predict. This probe runs each pipeline's
stages IN ISOLATION on device data — the same per-kernel attribution
discipline as the reference's event timing
(`/root/reference/src/benchmarks/clo_sort_bench.c:201-235`) — until the
bill adds up. Each stage is its own jit on already-device-resident inputs,
timed with the RTT-amortizing adaptive batch.

Usage:
  python -m cl_ops_tpu.bench.pipeline_probe --pipe q1 -n 24 --groups 65536
  python -m cl_ops_tpu.bench.pipeline_probe --pipe rollup -n 24
"""

from __future__ import annotations

import argparse
import functools
import sys


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pipe", default="q1",
                   choices=["q1", "rollup", "expand"])
    p.add_argument("--dup", type=int, default=4,
                   help="expand: matches per probe")
    p.add_argument("-n", "--log2n", type=int, default=24)
    p.add_argument("--groups", type=int, default=1 << 16)
    p.add_argument("--dim-log2", type=int, default=20)
    p.add_argument("--no-pallas", action="store_true")
    p.add_argument("--target-s", type=float, default=2.0)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax
    from cl_ops_tpu.utils.platform import honor_env_platform
    honor_env_platform()
    try:  # persistent compile cache: tunneled Mosaic
        # compiles are minutes; cache across runs
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp

    from cl_ops_tpu.bench import common
    from cl_ops_tpu.models import pipeline as pl
    from cl_ops_tpu.ops.exec import aggregate as agg
    from cl_ops_tpu.ops.exec import psort

    n = 1 << args.log2n
    up = not args.no_pallas
    sync = common.default_sync()
    rows = []

    def stage(name, fn, fargs=()):
        dt = common.time_adaptive(fn, fargs, sync, target_s=args.target_s)
        rows.append((name, dt))
        print(f"  {name:<28s} {dt * 1e3:9.2f} ms  "
              f"({n / dt / 1e6:8.1f} Mrows/s)", flush=True)
        return dt

    if args.pipe == "q1":
        g = args.groups
        print(f"q1 pipeline probe: n=2^{args.log2n}, groups={g}, "
              f"pallas={up}")

        @functools.partial(jax.jit, static_argnames=("nn",))
        def gen(nn):
            from cl_ops_tpu.ops.rng import threefry
            ids = jax.lax.broadcasted_iota(jnp.uint32, (nn,), 0)
            keys = (threefry.random_bits(0, ids, jnp.uint32(0))
                    % jnp.uint32(g)).astype(jnp.int32)
            qty = (threefry.random_bits(0, ids, jnp.uint32(1))
                   % jnp.uint32(1024)).astype(jnp.int32)
            price = (threefry.random_bits(0, ids, jnp.uint32(2))
                     % jnp.uint32(10000)).astype(jnp.int32)
            mask = qty < jnp.int32(768)
            return keys, qty, price, mask

        keys, qty, price, mask = jax.block_until_ready(gen(n))
        stage("gen (threefry x3 + mask)", lambda: gen(n))

        inv = jnp.int32(1) - mask.astype(jnp.int32)
        # the pipeline's real sort: (inv, key) compared, (q, p) payload
        sort4 = jax.jit(lambda a, b, c, d:
                        psort.sort_i32_cols((a, b, c, d), num_keys=2,
                                            pad_safe=True) if up else
                        tuple(jax.lax.sort([a, b, c, d], num_keys=2)))
        out = jax.block_until_ready(sort4(inv, keys, qty, price))
        stage("sort 4-col (2 keys + 2 pay)", sort4,
              (inv, keys, qty, price))

        _, skeys, sqty, sprice = out
        n_valid = jnp.sum(mask.astype(jnp.int32))

        # the full boundary reduce, all six aggregate slots, on pre-sorted
        # data (what _group_aggregate_cols_sort hands it)
        br = jax.jit(functools.partial(
            agg._boundary_reduce_cols, num_groups=g,
            aggs=("sum", "sum", "min", "max", "count", "mean"),
            key_ordered=(False,) * 6,
            use_pallas=up))
        fb = lambda k, q, p, nv: br(k, (q, p, q, p, q, p),  # noqa: E731
                                    n_valid=nv)
        jax.block_until_ready(fb(skeys, sqty, sprice, n_valid))
        stage("boundary reduce (6 aggs)", fb,
              (skeys, sqty, sprice, n_valid))

        # --- boundary sub-stages ---
        def subs():
            pos = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
            valid = pos < n_valid
            prev = jnp.concatenate([skeys[:1], skeys[:-1]])
            is_new = valid & jnp.concatenate(
                [jnp.ones((1,), jnp.bool_), (skeys != prev)[1:]])
            return valid, is_new
        valid, is_new = jax.block_until_ready(jax.jit(subs)())

        flags = jax.jit(lambda k, nv: subs())
        stage("  flags (prev-compare)", flags, (skeys, n_valid))

        cs1 = jax.jit(lambda x: jnp.cumsum(x.astype(jnp.int32)))
        jax.block_until_ready(cs1(is_new))
        stage("  one jnp.cumsum (i32)", cs1, (is_new,))

        csp = jax.jit(lambda x: agg._csum(x, True, jnp.int32))
        jax.block_until_ready(csp(is_new))
        stage("  one Pallas carry scan", csp, (is_new,))

        def ends_fn(isn, v):
            ones1 = jnp.ones((1,), jnp.bool_)
            nin = jnp.concatenate([isn[1:], ones1])
            niv = jnp.concatenate([jnp.logical_not(v)[1:], ones1])
            is_end = v & (nin | niv)
            er = agg._csum(is_end, up, jnp.int32)
            gi = jax.lax.broadcasted_iota(jnp.int32, (g,), 0)
            return agg._searchsorted_2level(er, gi + 1, n)
        ej = jax.jit(ends_fn)
        jax.block_until_ready(ej(is_new, valid))
        stage("  ends (scan + 2level search)", ej, (is_new, valid))

        from cl_ops_tpu.ops.scan.segmented import segmented_scan_1d
        sm = jax.jit(lambda v, f: segmented_scan_1d(
            v, f.astype(jnp.int32), op="max", exclusive=False,
            use_pallas=up))
        jax.block_until_ready(sm(sprice, is_new))
        stage("  segmented max (price)", sm, (sprice, is_new))

        full = lambda: pl.q1_query(n, num_groups=g,  # noqa: E731
                                   use_pallas=up)
        jax.block_until_ready(full())
        stage("FULL q1_query", full)

    elif args.pipe == "expand":
        # hash_join_expand accounting (VERDICT r4 weak #2: 0.093 roofline
        # at 140 Mpairs/s, bytes model vs reality unexplained). Stages:
        # _ranges_sorted (probe sort + 2 ub/lb band passes), pass-1
        # segment search, pass-2 value pull, glue.
        import numpy as np
        from cl_ops_tpu.ops.exec import join as jn
        from cl_ops_tpu.ops.exec import bandprobe
        from cl_ops_tpu.ops import sort as sort_mod
        dup = args.dup
        nd = 1 << args.dim_log2
        nkeys = max(nd // dup, 1)
        rng2 = np.random.RandomState(8)
        dk = (np.arange(nd, dtype=np.uint32) % nkeys)
        rng2.shuffle(dk)
        dv = np.arange(nd, dtype=np.int32)
        pk = jnp.asarray(rng2.randint(0, nkeys, size=n).astype(np.uint32))
        cap = dup * n
        sx = sort_mod.sort_new("xla", elem_dtype="uint")
        sdk, sdv = sx.sort_with_device_data(jnp.asarray(dk),
                                            jnp.asarray(dv))
        print(f"expand probe: n=2^{args.log2n} probes x {dup} matches, "
              f"build=2^{args.dim_log2}, pallas={up}")
        from cl_ops_tpu.utils.platform import pallas_interpret
        interp = pallas_interpret()
        bl = jn._jit_limbs(sdk)
        plimbs = jn._jit_limbs(pk)
        vcols = jn._jit_val_cols(sdv)

        rfn = lambda: jn._ranges_sorted(bl, vcols, plimbs, up,  # noqa
                                        "auto")
        spos, ub, lb = rfn()
        jax.block_until_ready(spos)
        stage("ranges (sort + 2 band)", rfn)

        p1q = lambda u, l: jn._expand_pass1_queries(  # noqa: E731
            u, l, capacity=cap)
        prefix_inc, rq = jax.block_until_ready(p1q(ub, lb))
        stage("  pass1 queries (cumsum)", p1q, (ub, lb))

        pr = 128
        p1 = lambda pi, l, s, r: bandprobe.probe_banded_sorted(  # noqa
            (pi,), (pi, l, s), (r,), probe_rows=pr, interpret=interp)
        out1 = jax.block_until_ready(p1(prefix_inc, lb, spos, rq))
        stage("pass1 band (segment search)", p1,
              (prefix_inc, lb, spos, rq))
        j, _, vps, vns, ovf1 = out1
        assert not bool(ovf1)
        lbj, sposj = vns[1], vns[2]

        p2i = lambda a, b, c, d: jn._expand_pass2_inputs(  # noqa: E731
            a, b, c, d, nb=nd, block=pr * bandprobe.LANES)
        bpos, blo, bhi = jax.block_until_ready(p2i(lbj, rq, j, vps[0]))
        stage("  pass2 inputs (blk minmax)", p2i, (lbj, rq, j, vps[0]))

        ikeys = jnp.arange(nd, dtype=jnp.int32)
        p2 = lambda b, lo2, hi2: bandprobe.probe_banded_sorted(  # noqa
            (ikeys,), tuple(vcols), (b,), probe_rows=pr,
            block_bounds=((lo2,), (hi2,)), interpret=interp)
        out2 = jax.block_until_ready(p2(bpos, blo, bhi))
        stage("pass2 band (value pull)", p2, (bpos, blo, bhi))
        ovf2 = out2[4]
        print(f"    pass2 band overflow: {bool(ovf2)}")
        if bool(ovf2):
            g2 = lambda b: jn._jit_gather(tuple(vcols), b)  # noqa
            jax.block_until_ready(g2(bpos))
            stage("pass2 DIRECT gather", g2, (bpos,))

        gl = lambda a, b, c: jn._expand_glue(  # noqa: E731
            a, b, c, capacity=cap)
        valsr = out2[2]
        jax.block_until_ready(gl(sposj, valsr, prefix_inc))
        stage("  glue", gl, (sposj, valsr, prefix_inc))

        full = lambda p: jn.hash_join_expand(  # noqa
            sdk, sdv, p, capacity=cap, build_sorted=True, use_pallas=up)
        jax.block_until_ready(full(pk))
        stage("FULL hash_join_expand", full, (pk,))

    else:  # rollup
        nd = 1 << args.dim_log2
        print(f"rollup pipeline probe: n=2^{args.log2n}, dim=2^"
              f"{args.dim_log2}, pallas={up}")
        from cl_ops_tpu.ops.exec import join as jn

        @functools.partial(jax.jit, static_argnames=("nn",))
        def gen(nn):
            keys, measures = pl.generate_table(nn, 0, key_space=2 * nd)
            return keys, measures.astype(jnp.int32)

        keys, measures = jax.block_until_ready(gen(n))
        stage("gen (threefry x2)", lambda: gen(n))

        dim_keys = jax.lax.broadcasted_iota(jnp.uint32, (nd,), 0) * 2
        dim_vals = jax.lax.broadcasted_iota(jnp.int32, (nd,), 0)
        impl = "banded" if up else "merge"

        def join_only(k, m):
            return jn.hash_join(
                dim_keys, dim_vals, k, build_sorted=True, use_pallas=up,
                sorted_output=True, probe_impl=impl,
                probe_cols=(m, k), defer_overflow=True)
        out = jax.block_until_ready(join_only(keys, measures))
        stage("join (sorted_output+defer)", join_only, (keys, measures))

        found, _, _, (m_s, k_s), _ = out

        def agg_only(f, ms, ks):
            contrib = jnp.where(f, ms, jnp.int32(0))
            return agg.group_aggregate_sorted(
                ks, contrib, num_groups=2 * nd, agg="sum",
                keys_sorted=True, use_pallas=up)
        jax.block_until_ready(agg_only(found, m_s, k_s))
        stage("aggregate (keys_sorted)", agg_only, (found, m_s, k_s))

        # probe-sort share of the join: same column layout the banded
        # sorted_output path sorts (key, pos, 2 payload cols)
        pos = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
        s4 = jax.jit(lambda a, b, c, d:
                     psort.sort_i32_cols((a, b, c, d)) if up else
                     tuple(jax.lax.sort([a, b, c, d], num_keys=4)))
        ki = psort.as_i32(keys)
        jax.block_until_ready(s4(ki, pos, measures, ki))
        stage("  probe sort 4-col", s4, (ki, pos, measures, ki))

        full = lambda: pl.rollup_query(n, dim_rows=nd,  # noqa: E731
                                       use_pallas=up, defer=True)
        jax.block_until_ready(full())
        stage("FULL rollup_query(defer)", full)

    total_stages = sum(dt for nm, dt in rows
                       if not nm.startswith(("FULL", "  ")))
    full_dt = rows[-1][1]
    print(f"\n  stage sum (top-level)        {total_stages * 1e3:9.2f} ms"
          f"   vs FULL {full_dt * 1e3:.2f} ms"
          f"   (unaccounted {(full_dt - total_stages) * 1e3:+.2f} ms)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
