"""Device frame reconstruction driver.

Runs the pixel back-half of one ALL-INTRA frame on the JAX device:
residual buckets (dequant + inverse transform), the wavefront intra
scan (ops/kernels/wavefront.py), and CDEF — with ONE host->device
upload of the plan tensors and ONE device->host fetch of the final
planes.  Frames the device path can't take (inter until it lands on
device) fall back to the host pipeline.

Blocks are packed into two fixed shape buckets (T in {16, 64}) with
per-lane (w, h) data and power-of-two capacities, and the level scan
runs in fixed-size chunks, so the executor's jit key is stable across
the frames of a stream (and small enough to compile fast)
[SURVEY §7.1/§7.3: entropy/pixel split, wavefront batching].
"""

from __future__ import annotations

import numpy as np

from av1dec_tpu.ops.kernels.wavefront import _DEV_FIELDS
from av1dec_tpu.ops.spec import dequant, itx
from av1dec_tpu.pipeline import wavefront as wf

TX_DIMS = itx.TX_DIMS
BUCKETS = (16, 64)
FLAT_PAD = 64  # tail pad so T-wide row windows never cross the end
_DEV_F = {name: i for i, name in enumerate(_DEV_FIELDS)}


def _pow2(n, lo=1):
    return max(lo, 1 << max(0, (int(n) - 1).bit_length()))


def _bucket_for(w, h):
    return 16 if max(w, h) <= 16 else 64


# Monotonic per-geometry capacity cache: all device array extents are
# rounded up to powers of two AND to the largest extent seen so far for
# this frame geometry, so the executor's jit key converges after the
# first frame (or two) of a stream instead of recompiling per frame.
# Bench/batch callers pre-warm it across a whole stream (warm_caps) so
# the key is stable from the first device dispatch.
_CAPS = {}


def _caps_for(sch, batch=1):
    key = (sch.flat_len, sch.bd, sch.sub_x, sch.sub_y,
           sch.enable_edge_filter, batch)
    return _CAPS.setdefault(key, {
        "B": dict.fromkeys(BUCKETS, 8),    # lanes per level window
        "N": dict.fromkeys(BUCKETS, 8),    # packed rows
        "R": dict.fromkeys(BUCKETS, 1),    # residual slots
        "P": dict.fromkeys(BUCKETS, 1),    # palette slots
    })


def _cap(caps, field, t, needed):
    v = max(caps[field][t], _pow2(needed, caps[field][t]))
    caps[field][t] = v
    return v


def _pad_rows(arr, n_total):
    """Pad packed lane rows to n_total with inert lanes (OOB-safe)."""
    pad = np.zeros((max(0, n_total - len(arr)), len(_DEV_FIELDS)),
                   np.int32)
    pad[:, _DEV_F["res_idx"]] = -1
    pad[:, _DEV_F["pal_idx"]] = -1
    pad[:, _DEV_F["above_case"]] = 2
    pad[:, _DEV_F["left_case"]] = 2
    pad[:, _DEV_F["corner_case"]] = 3
    pad[:, _DEV_F["dc_case"]] = 3
    pad[:, _DEV_F["w"]] = pad[:, _DEV_F["h"]] = 4
    pad[:, _DEV_F["lw"]] = pad[:, _DEV_F["lh"]] = 2
    return np.concatenate([arr[:n_total], pad], axis=0)


class DeviceRecon:
    """Device executor for one frame; `run()` returns host planes.

    Use `supported()` first; construction assumes an all-intra frame.
    """

    def __init__(self, seq, hdr, plans, config=None):
        from av1dec_tpu.pipeline.recon import FrameRecon
        self.config = config
        self._fr = FrameRecon(seq, hdr, plans)
        self.sch = wf.build_schedule(seq, hdr, plans, self._fr._filter_type)
        self.seq, self.hdr, self.plans = seq, hdr, plans
        if self.sch is not None:
            # deterministic per-(w, h) offsets into the bucket tensors
            self._res_off, self._pal_off = {}, {}
            self._res_tot = dict.fromkeys(BUCKETS, 0)
            self._pal_tot = dict.fromkeys(BUCKETS, 0)
            for key in sorted(self.sch.classes):
                t = _bucket_for(*key)
                self._res_off[key] = self._res_tot[t]
                self._res_tot[t] += self.sch.res_count.get(key, 0)
                self._pal_off[key] = self._pal_tot[t]
                self._pal_tot[t] += len(self.sch.pal_preds.get(key, []))

    def supported(self):
        if self.sch is None:
            return False
        hdr = self.hdr
        lf = hdr.get("lf") or {}
        if any(lf.get("level", [0, 0, 0, 0])):
            return False  # deblock not on device yet
        if hdr.get("use_superres"):
            return False
        lr_types = (hdr.get("lr") or {}).get("frame_restoration_type",
                                             [0, 0, 0])
        if any(lr_types):
            return False
        return True

    # -- residuals on device ---------------------------------------------
    def _residuals_device(self, jnp, coeffs_dev, caps=None):
        """Returns {T: [R, T, T] int32 device arrays} (R >= 1, pow2)."""
        from av1dec_tpu.ops.kernels.itx import residual_bucket
        from av1dec_tpu.ops.tables_data import AC_Q, DC_Q
        sch, plans, hdr, bd = self.sch, self.plans, self.hdr, self.sch.bd
        q = hdr["quant"]
        use_qm = bool(q.get("using_qmatrix"))
        qm_by_plane = (q.get("qm_y", 15), q.get("qm_u", 15),
                       q.get("qm_v", 15))
        g = plans.grid
        qindex_g, lossless_g = g("qindex"), g("lossless")
        mi_cols = plans.mi_cols
        bi = {8: 0, 10: 1, 12: 2}[bd]

        buckets = {}
        for key, recs in sch.res_recs.items():
            for slot, i in enumerate(recs):
                rec = plans.tx[i]
                buckets.setdefault((int(rec[3]), int(rec[4])), []).append(
                    (key, slot, i))
        if caps is None:
            caps = _caps_for(sch)
        out = {t: jnp.zeros((_cap(caps, "R", t, self._res_tot[t]), t, t),
                            jnp.int32)
               for t in BUCKETS}
        host_rows = {}  # lossless/WHT rows computed on host, per bucket
        for (tsz, tt), items in buckets.items():
            w, h = (4, 4) if tsz == 19 else TX_DIMS[tsz]
            t = _bucket_for(w, h)
            aw, ah = (4, 4) if tsz == 19 else (min(w, 32), min(h, 32))
            n = aw * ah
            B = len(items)
            offs = np.zeros(B, np.int64)
            qidx = np.zeros(B, np.int64)
            dcd = np.zeros(B, np.int64)
            acd = np.zeros(B, np.int64)
            lossless = np.zeros(B, bool)
            slots_g = np.zeros(B, np.int64)
            qml = np.full(B, 15, np.int64)
            qmc = np.zeros(B, bool)
            qm_ok = use_qm and tt < 9  # qm only for 2-D transforms
            for b, (key, slot, i) in enumerate(items):
                rec = plans.tx[i]
                offs[b] = int(rec[6])
                mi = int(rec[7])
                mi_r, mi_c = mi // mi_cols, mi % mi_cols
                qidx[b] = qindex_g[mi_r, mi_c]
                lossless[b] = bool(lossless_g[mi_r, mi_c])
                slots_g[b] = self._res_off[key] + slot
                plane = int(rec[0])
                if plane == 0:
                    dcd[b], acd[b] = q["delta_q_y_dc"], 0
                elif plane == 1:
                    dcd[b], acd[b] = q["delta_q_u_dc"], q["delta_q_u_ac"]
                else:
                    dcd[b], acd[b] = q["delta_q_v_dc"], q["delta_q_v_ac"]
                if qm_ok and not lossless[b]:
                    qml[b] = qm_by_plane[plane]
                    qmc[b] = plane >= 1
            if tsz == 19 or lossless.any() or (qml < 15).any():
                from av1dec_tpu.ops.qm_data import qm_row
                for b, (key, slot, i) in enumerate(items):
                    lv = self.plans.coeffs[offs[b]: offs[b] + n]
                    dq = dequant.dequant_block(
                        lv, tsz, int(qidx[b]), bd, int(dcd[b]),
                        int(acd[b]), bool(lossless[b]),
                        qm=qm_row(int(qml[b]), bool(qmc[b]), w, h))
                    host_rows.setdefault((t, h, w), []).append(
                        (slots_g[b], itx.inverse_transform(dq, tsz, tt, bd)))
                continue
            dcq = DC_Q[bi, np.clip(qidx + dcd, 0, 255)].astype(np.int32)
            acq = AC_Q[bi, np.clip(qidx + acd, 0, 255)].astype(np.int32)
            Bp = _pow2(B)
            if Bp != B:
                offs = np.concatenate([offs, np.zeros(Bp - B, np.int64)])
                dcq = np.concatenate([dcq, np.ones(Bp - B, np.int32)])
                acq = np.concatenate([acq, np.ones(Bp - B, np.int32)])
            levels = coeffs_dev[jnp.asarray(offs.astype(np.int32))[:, None]
                                + jnp.arange(n, dtype=jnp.int32)[None, :]]
            res = residual_bucket(levels, jnp.asarray(dcq),
                                  jnp.asarray(acq), tsz, tt, bd)
            out[t] = out[t].at[jnp.asarray(slots_g), :h, :w].set(res[:B])
        for (t, h, w), pairs in host_rows.items():
            slots = np.asarray([s for s, _ in pairs])
            rows = np.stack([r for _, r in pairs]).astype(np.int32)
            out[t] = out[t].at[slots, :h, :w].set(jnp.asarray(rows))
        return out

    # -- schedule packing --------------------------------------------------
    def _bucket_rows(self, t):
        """All of this frame's lanes for bucket t as (rows [N, F] int32,
        levels [N]) with bucket-global residual/palette slot indices."""
        sch = self.sch
        FD = len(_DEV_FIELDS)
        rows, lvls = [], []
        for key, bc in sorted(sch.classes.items()):
            w, h = key
            if _bucket_for(w, h) != t:
                continue
            N = len(bc.levels_sorted)
            arr = np.zeros((N, FD), np.int32)
            for f, a in bc.packed.items():
                arr[:, _DEV_F[f]] = a
            ridx = arr[:, _DEV_F["res_idx"]]
            arr[:, _DEV_F["res_idx"]] = np.where(
                ridx >= 0, ridx + self._res_off[key], -1)
            pidx = arr[:, _DEV_F["pal_idx"]]
            arr[:, _DEV_F["pal_idx"]] = np.where(
                pidx >= 0, pidx + self._pal_off[key], -1)
            arr[:, _DEV_F["w"]] = w
            arr[:, _DEV_F["h"]] = h
            arr[:, _DEV_F["lw"]] = int(np.log2(w))
            arr[:, _DEV_F["lh"]] = int(np.log2(h))
            rows.append(arr)
            lvls.append(bc.levels_sorted)
        if rows:
            return (np.concatenate(rows, axis=0),
                    np.concatenate(lvls).astype(np.int64))
        return np.zeros((0, FD), np.int32), np.zeros(0, np.int64)

    def _palette_tensor(self, t, P):
        sch = self.sch
        pt = np.zeros((P, t, t), np.int32)
        for key, preds in sch.pal_preds.items():
            if _bucket_for(*key) != t:
                continue
            off = self._pal_off[key]
            w, h = key
            for k, pr in enumerate(preds):
                pt[off + k, :h, :w] = pr
        return pt

    def _pack_buckets(self, jnp):
        """Regroup the per-(w, h) schedule classes into the fixed shape
        buckets, remapping residual/palette slots to bucket-global
        indices.  Returns (buckets config, inputs, pal tensors)."""
        caps = _caps_for(self.sch)
        buckets = []
        inputs = {}
        pal = {}
        for t in BUCKETS:
            arr, lv = self._bucket_rows(t)
            order = np.argsort(lv, kind="stable")
            arr, lv = arr[order], lv[order]
            L = self.sch.n_levels
            starts = np.zeros(L, np.int32)
            counts = np.zeros(L, np.int32)
            if len(lv):
                uniq, s_idx, cnt = np.unique(lv, return_index=True,
                                             return_counts=True)
                starts[uniq - 1] = s_idx
                counts[uniq - 1] = cnt
            Bmax = _cap(caps, "B", t, counts.max() if len(lv) else 0)
            n_cap = _cap(caps, "N", t, len(arr))
            packed = _pad_rows(arr, n_cap + Bmax)
            buckets.append((t, int(Bmax)))
            inputs[t] = (jnp.asarray(packed), starts, counts)
            P = _cap(caps, "P", t, self._pal_tot[t])
            pal[t] = jnp.asarray(self._palette_tensor(t, P))
        return tuple(buckets), inputs, pal

    def run_device(self):
        """Returns the final planes as DEVICE arrays (async)."""
        import jax.numpy as jnp
        from av1dec_tpu.ops.kernels.wavefront import run_wavefront
        sch = self.sch
        coeffs_dev = jnp.asarray(
            np.asarray(self.plans.coeffs, np.int32))
        res = self._residuals_device(jnp, coeffs_dev)
        buckets, inputs, pal = self._pack_buckets(jnp)
        config = (buckets, sch.bd, sch.sub_x, sch.sub_y,
                  sch.enable_edge_filter)
        frame0 = jnp.zeros(sch.flat_len + FLAT_PAD, jnp.int32)
        frame = run_wavefront(frame0, inputs, res, pal, config)
        planes = self._slice_planes(frame, 0)
        # CDEF on device (same dispatch chain, no host round trip)
        planes = self._cdef_device(jnp, planes)
        # narrow for the d2h transfer (link bandwidth dominates)
        odt = jnp.uint8 if sch.bd == 8 else jnp.uint16
        return [p.astype(odt) for p in planes]

    def _slice_planes(self, frame, base):
        sch = self.sch
        planes = []
        for p in range(sch.num_planes):
            ha, wa = sch.alloc_dims[p]
            vh, vw = sch.valid_dims[p]
            b = base + sch.plane_base[p]
            planes.append(frame[b: b + ha * wa].reshape(ha, wa)[:vh, :vw])
        return planes

    def _cdef_device(self, jnp, planes):
        from av1dec_tpu.ops.kernels import cdef as cdef_dev
        gates = cdef_dev.compute_gates(self.seq, self.hdr, self.plans,
                                       len(planes), self.sch.bd)
        if gates is None:
            return planes
        n_shards = getattr(self.config, "space_shards", 0) or 0
        if n_shards > 1 and planes[0].shape[1] % (8 * n_shards) == 0:
            import jax
            from jax.sharding import Mesh

            from av1dec_tpu.parallel.sharded_cdef import cdef_sharded
            devs = jax.devices()
            if len(devs) >= n_shards:
                mesh = Mesh(np.asarray(devs[:n_shards]), ("space",))
                return list(cdef_sharded(
                    tuple(p.astype(jnp.int32) for p in planes), gates,
                    self.sch.bd, mesh))
        y_pri, y_sec, uv_pri, uv_sec, damping, subx, suby = gates
        outs = cdef_dev._cdef_all(
            tuple(planes), jnp.asarray(y_pri), jnp.asarray(y_sec),
            jnp.asarray(uv_pri), jnp.asarray(uv_sec), self.sch.bd,
            damping, subx, suby)
        return list(outs)

    def run(self):
        """Full frame on device; returns host planes (int64, like
        FrameRecon.run)."""
        import jax
        planes = self.run_device()
        fetched = jax.device_get(planes)
        return [np.asarray(p).astype(np.int64) for p in fetched]


def run_device_batch(drs):
    """Decode K same-geometry intra frames in ONE wavefront run.

    Frames are independent, so level i of every frame executes at scan
    step i — the per-level dispatch overhead (the dominant cost at
    1080p, where levels carry only tens of lanes) is amortized K ways.
    Lanes carry per-frame base offsets into a [K * (flat_len + pad)]
    buffer; residual/palette tensors are concatenated per bucket with
    uniform per-frame capacity so slot remapping is a constant stride.

    Returns a list (per frame) of device plane lists (async).
    """
    import jax.numpy as jnp

    from av1dec_tpu.ops.kernels.wavefront import run_wavefront

    K = len(drs)
    sch0 = drs[0].sch
    caps = _caps_for(sch0, batch=True)
    flat = sch0.flat_len + FLAT_PAD
    Rcap = {t: _cap(caps, "R", t, max(dr._res_tot[t] for dr in drs))
            for t in BUCKETS}
    Pcap = {t: _cap(caps, "P", t, max(dr._pal_tot[t] for dr in drs))
            for t in BUCKETS}

    res_f = []
    for dr in drs:
        coeffs_dev = jnp.asarray(np.asarray(dr.plans.coeffs, np.int32))
        res_f.append(dr._residuals_device(jnp, coeffs_dev, caps=caps))
    res = {t: jnp.concatenate([rf[t] for rf in res_f], axis=0)
           for t in BUCKETS}
    pal = {t: jnp.asarray(np.concatenate(
        [dr._palette_tensor(t, Pcap[t]) for dr in drs], axis=0))
        for t in BUCKETS}

    L = max(dr.sch.n_levels for dr in drs)
    buckets = []
    inputs = {}
    for t in BUCKETS:
        rows_all, lv_all = [], []
        for f, dr in enumerate(drs):
            arr, lv = dr._bucket_rows(t)
            arr = arr.copy()
            arr[:, _DEV_F["base"]] += f * flat
            ridx = arr[:, _DEV_F["res_idx"]]
            arr[:, _DEV_F["res_idx"]] = np.where(
                ridx >= 0, ridx + f * Rcap[t], -1)
            pidx = arr[:, _DEV_F["pal_idx"]]
            arr[:, _DEV_F["pal_idx"]] = np.where(
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
        Bmax = _cap(caps, "B", t, counts.max() if len(lv) else 0)
        n_cap = _cap(caps, "N", t, len(arr))
        packed = _pad_rows(arr, n_cap + Bmax)
        buckets.append((t, int(Bmax)))
        inputs[t] = (jnp.asarray(packed), starts, counts)

    config = (tuple(buckets), sch0.bd, sch0.sub_x, sch0.sub_y,
              sch0.enable_edge_filter)
    frame0 = jnp.zeros(K * flat, jnp.int32)
    frame = run_wavefront(frame0, inputs, res, pal, config)

    outs = []
    for f, dr in enumerate(drs):
        planes = dr._slice_planes(frame, f * flat)
        planes = dr._cdef_device(jnp, planes)
        odt = jnp.uint8 if sch0.bd == 8 else jnp.uint16
        outs.append([p.astype(odt) for p in planes])
    return outs
