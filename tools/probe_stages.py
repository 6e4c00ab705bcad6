"""Stage-level timing of the batched device path on the real backend."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import aomffi
    import bench
    from av1dec_tpu.bindings import NativeParser
    from av1dec_tpu.ops.kernels.wavefront import (CHUNK,
                                                  run_wavefront_chunk)
    from av1dec_tpu.pipeline import device_recon as DR

    bench.ensure_stream()
    datas = [d for _, d in aomffi.read_ivf(bench.STREAM)]
    print(f"device={jax.devices()[0]}", flush=True)
    parser = NativeParser(threads=2)
    drs = []
    t0 = time.time()
    for d in datas:
        for hdr, plans in parser.parse_tu(d, with_plans=True):
            drs.append(DR.DeviceRecon(parser.seq, hdr, plans))
    print(f"host parse+sched: {(time.time()-t0)/len(drs)*1000:.0f} "
          f"ms/frame", flush=True)

    for it in range(3):
        K = len(drs)
        sch0 = drs[0].sch
        caps = DR._caps_for(sch0, batch=True)
        flat = sch0.flat_len + DR.FLAT_PAD
        Rcap = {t: DR._cap(caps, "R", t,
                           max(dr._res_tot[t] for dr in drs))
                for t in DR.BUCKETS}
        Pcap = {t: DR._cap(caps, "P", t,
                           max(dr._pal_tot[t] for dr in drs))
                for t in DR.BUCKETS}

        t0 = time.time()
        res_f = [dr._residuals_host(jnp, caps=caps) for dr in drs]
        res = {t: jnp.concatenate([rf[t] for rf in res_f], axis=0)
               for t in DR.BUCKETS}
        for t in DR.BUCKETS:
            res[t].block_until_ready()
        t_res = time.time() - t0

        t0 = time.time()
        pal = {t: jnp.asarray(np.concatenate(
            [dr._palette_tensor(t, Pcap[t]) for dr in drs], axis=0))
            for t in DR.BUCKETS}
        L = max(dr.sch.n_levels for dr in drs)
        buckets = []
        inputs = {}
        for t in DR.BUCKETS:
            rows_all, lv_all = [], []
            for f, dr in enumerate(drs):
                arr, lv = dr._bucket_rows(t)
                arr = arr.copy()
                arr[:, DR._DEV_F["base"]] += f * flat
                ridx = arr[:, DR._DEV_F["res_idx"]]
                arr[:, DR._DEV_F["res_idx"]] = np.where(
                    ridx >= 0, ridx + f * Rcap[t], -1)
                pidx = arr[:, DR._DEV_F["pal_idx"]]
                arr[:, DR._DEV_F["pal_idx"]] = np.where(
                    pidx >= 0, pidx + f * Pcap[t], -1)
                rows_all.append(arr)
                lv_all.append(lv)
            arr = np.concatenate(rows_all, axis=0)
            lv = np.concatenate(lv_all)
            order = np.argsort(lv, kind="stable")
            arr, lv = arr[order], lv[order]
            starts = np.zeros(L, np.int32)
            counts = np.zeros(L, np.int32)
            if len(lv):
                uniq, s_idx, cnt = np.unique(lv, return_index=True,
                                             return_counts=True)
                starts[uniq - 1] = s_idx
                counts[uniq - 1] = cnt
            Bmax = DR._cap(caps, "B", t, counts.max() if len(lv) else 0)
            n_cap = DR._cap(caps, "N", t, len(arr))
            packed = DR._pad_rows(arr, n_cap + Bmax)
            buckets.append((t, int(Bmax)))
            inputs[t] = (jnp.asarray(packed), starts, counts)
        for t in DR.BUCKETS:
            inputs[t][0].block_until_ready()
        t_pack = time.time() - t0
        print(f"iter {it}: caps B={caps['B']} N={caps['N']} L={L}",
              flush=True)

        config = (tuple(buckets), sch0.bd, sch0.sub_x, sch0.sub_y,
                  sch0.enable_edge_filter)
        frame0 = jnp.zeros(K * flat, jnp.int32)
        ts = [t for t, _ in buckets]
        packed_d = {t: inputs[t][0] for t in ts}
        starts_np = np.stack([inputs[t][1] for t in ts], 1)
        counts_np = np.stack([inputs[t][2] for t in ts], 1)
        n_chunks = max(1, -(-L // CHUNK))
        pad = n_chunks * CHUNK - L
        if pad:
            starts_np = np.pad(starts_np, ((0, pad), (0, 0)))
            counts_np = np.pad(counts_np, ((0, pad), (0, 0)))
        t0 = time.time()
        frame = frame0
        for k in range(n_chunks):
            sl = slice(k * CHUNK, (k + 1) * CHUNK)
            frame = run_wavefront_chunk(
                frame, packed_d, jnp.asarray(starts_np[sl]),
                jnp.asarray(counts_np[sl]), res, pal, config)
        frame.block_until_ready()
        t_scan = time.time() - t0

        t0 = time.time()
        outs = []
        for f, dr in enumerate(drs):
            planes = dr._slice_planes(frame, f * flat)
            planes = dr._cdef_device(jnp, planes)
            outs.append([p.astype(jnp.uint8) for p in planes])
        for planes in outs:
            for p in planes:
                p.block_until_ready()
        t_cdef = time.time() - t0

        t0 = time.time()
        host = jax.device_get(outs)
        t_fetch = time.time() - t0
        tot = t_res + t_pack + t_scan + t_cdef + t_fetch
        print(f"iter {it}: res {t_res:.2f}s pack {t_pack:.2f}s "
              f"scan({n_chunks}ch) {t_scan:.2f}s cdef+slice {t_cdef:.2f}s "
              f"fetch {t_fetch:.2f}s total {tot:.2f}s "
              f"({len(drs)/tot:.2f} fps)", flush=True)


if __name__ == "__main__":
    main()
