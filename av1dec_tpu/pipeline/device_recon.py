"""Device frame reconstruction driver.

Runs the pixel back-half of one ALL-INTRA frame on the JAX device:
residual buckets (dequant + inverse transform), the wavefront intra
scan (ops/kernels/wavefront.py), and CDEF — with ONE host->device
upload of the plan tensors and ONE device->host fetch of the final
planes.  Frames the device path can't take (inter, deblock/LR present
until those land on device) fall back to the host pipeline.

[SURVEY §7.1/§7.3: entropy/pixel split, wavefront batching]
"""

from __future__ import annotations

import numpy as np

from av1dec_tpu.ops.spec import dequant, itx
from av1dec_tpu.pipeline import wavefront as wf

TX_DIMS = itx.TX_DIMS


def _pow2(n):
    return 1 << max(0, (int(n) - 1).bit_length())


class DeviceRecon:
    """Device executor for one frame; `run()` returns host planes.

    Use `supported(seq, hdr, plans)` first; construction assumes an
    all-intra frame.
    """

    def __init__(self, seq, hdr, plans):
        from av1dec_tpu.pipeline.recon import FrameRecon
        self._fr = FrameRecon(seq, hdr, plans)
        self.sch = wf.build_schedule(seq, hdr, plans, self._fr._filter_type)
        self.seq, self.hdr, self.plans = seq, hdr, plans

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
    def _residuals_device(self, jnp, coeffs_dev):
        """Returns {key: [R, h, w] int32 device arrays} (R >= 1)."""
        from av1dec_tpu.ops.kernels.itx import residual_bucket
        from av1dec_tpu.ops.tables_data import AC_Q, DC_Q
        sch, plans, hdr, bd = self.sch, self.plans, self.hdr, self.sch.bd
        q = hdr["quant"]
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
        out = {key: jnp.zeros((max(sch.res_count.get(key, 0), 1),
                               key[1], key[0]), jnp.int32)
               for key in sch.classes}
        host_rows = {}  # lossless/WHT rows computed on host
        for (tsz, tt), items in buckets.items():
            w, h = (4, 4) if tsz == 19 else TX_DIMS[tsz]
            aw, ah = (4, 4) if tsz == 19 else (min(w, 32), min(h, 32))
            n = aw * ah
            B = len(items)
            offs = np.zeros(B, np.int64)
            qidx = np.zeros(B, np.int64)
            dcd = np.zeros(B, np.int64)
            acd = np.zeros(B, np.int64)
            lossless = np.zeros(B, bool)
            for b, (key, slot, i) in enumerate(items):
                rec = plans.tx[i]
                offs[b] = int(rec[6])
                mi = int(rec[7])
                mi_r, mi_c = mi // mi_cols, mi % mi_cols
                qidx[b] = qindex_g[mi_r, mi_c]
                lossless[b] = bool(lossless_g[mi_r, mi_c])
                plane = int(rec[0])
                if plane == 0:
                    dcd[b], acd[b] = q["delta_q_y_dc"], 0
                elif plane == 1:
                    dcd[b], acd[b] = q["delta_q_u_dc"], q["delta_q_u_ac"]
                else:
                    dcd[b], acd[b] = q["delta_q_v_dc"], q["delta_q_v_ac"]
            if tsz == 19 or lossless.any():
                for b, (key, slot, i) in enumerate(items):
                    lv = self.plans.coeffs[offs[b]: offs[b] + n]
                    dq = dequant.dequant_block(
                        lv, tsz, int(qidx[b]), bd, int(dcd[b]),
                        int(acd[b]), bool(lossless[b]))
                    host_rows.setdefault(key, []).append(
                        (slot, itx.inverse_transform(dq, tsz, tt, bd)))
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
            # scatter rows into the per-(w, h) class tensors
            per_key = {}
            for b, (key, slot, i) in enumerate(items):
                per_key.setdefault(key, ([], []))
                per_key[key][0].append(b)
                per_key[key][1].append(slot)
            for key, (rows, slots) in per_key.items():
                out[key] = out[key].at[np.asarray(slots)].set(
                    res[np.asarray(rows)])
        for key, pairs in host_rows.items():
            slots = np.asarray([s for s, _ in pairs])
            rows = np.stack([r for _, r in pairs]).astype(np.int32)
            out[key] = out[key].at[slots].set(jnp.asarray(rows))
        return out

    # -- schedule packing --------------------------------------------------
    def _pack_classes(self, jnp):
        sch = self.sch
        Lp = (sch.n_levels + 31) // 32 * 32
        classes = []
        inputs = {}
        pal = {}
        for key, bc in sorted(sch.classes.items()):
            N = len(bc.levels_sorted)
            Bmax = max(se[1] - se[0] for se in bc.level_slices.values())
            Bmax = _pow2(Bmax)
            F = len(wf._SCALAR_FIELDS)
            packed = np.zeros((N + Bmax, F), np.int32)
            for f, arr in bc.packed.items():
                packed[:N, wf._SCALAR_FIELDS.index(f)] = arr
            packed[N:, wf._SCALAR_FIELDS.index("res_idx")] = -1
            packed[N:, wf._SCALAR_FIELDS.index("pal_idx")] = -1
            starts = np.zeros(Lp, np.int32)
            counts = np.zeros(Lp, np.int32)
            for lvl, (s, e) in bc.level_slices.items():
                starts[lvl - 1] = s
                counts[lvl - 1] = e - s
            fams = frozenset(np.unique(bc.packed["mode_family"]).tolist())
            if (bc.packed["cfl_maxx"] > 0).any():
                fams = fams | {"cfl"}
            classes.append((key, int(Bmax), fams))
            inputs[key] = (jnp.asarray(packed), jnp.asarray(starts),
                           jnp.asarray(counts))
            if key in sch.pal_preds:
                pal[key] = jnp.asarray(
                    np.stack(sch.pal_preds[key]).astype(np.int32))
        return tuple(classes), inputs, pal, Lp

    def run_device(self):
        """Returns the final planes as DEVICE arrays (async)."""
        import jax.numpy as jnp
        from av1dec_tpu.ops.kernels.wavefront import run_wavefront
        sch = self.sch
        coeffs_dev = jnp.asarray(
            np.asarray(self.plans.coeffs, np.int32))
        res = self._residuals_device(jnp, coeffs_dev)
        classes, inputs, pal, Lp = self._pack_classes(jnp)
        config = (classes, sch.bd, sch.sub_x, sch.sub_y,
                  sch.enable_edge_filter, Lp)
        frame0 = jnp.zeros(sch.flat_len, jnp.int32)
        frame = run_wavefront(frame0, inputs, res, pal, config)
        planes = []
        for p in range(sch.num_planes):
            ha, wa = sch.alloc_dims[p]
            vh, vw = sch.valid_dims[p]
            b = sch.plane_base[p]
            planes.append(frame[b: b + ha * wa].reshape(ha, wa)[:vh, :vw])
        # CDEF on device (same dispatch chain, no host round trip)
        planes = self._cdef_device(jnp, planes)
        # narrow for the d2h transfer (link bandwidth dominates)
        odt = jnp.uint8 if sch.bd == 8 else jnp.uint16
        return [p.astype(odt) for p in planes]

    def _cdef_device(self, jnp, planes):
        hdr, seq, plans, bd = self.hdr, self.seq, self.plans, self.sch.bd
        c = hdr.get("cdef")
        if not c or hdr.get("coded_lossless") or hdr.get("allow_intrabc"):
            return planes
        nstr = 1 << c["bits"]
        if all(c["y_pri"][i] == 0 and c["y_sec"][i] == 0 and
               c["uv_pri"][i] == 0 and c["uv_sec"][i] == 0
               for i in range(nstr)):
            return planes
        from av1dec_tpu.ops.kernels import cdef as cdef_dev
        coeff_shift = bd - 8
        mi_rows, mi_cols = plans.mi_rows, plans.mi_cols
        skip = plans.grid("skip").astype(np.int64)
        cdef_mi = plans.grid("cdef").astype(np.int64)
        subx = seq.get("subsampling_x", 1) if len(planes) > 1 else 0
        suby = seq.get("subsampling_y", 1) if len(planes) > 1 else 0
        uR, uC = (mi_rows + 1) // 2, (mi_cols + 1) // 2
        r1 = np.minimum(np.arange(uR) * 2 + 1, mi_rows - 1)
        c1 = np.minimum(np.arange(uC) * 2 + 1, mi_cols - 1)
        r0 = np.arange(uR) * 2
        c0 = np.arange(uC) * 2
        unit_skip = skip[np.ix_(r0, c0)] & skip[np.ix_(r0, c1)] & \
            skip[np.ix_(r1, c0)] & skip[np.ix_(r1, c1)]
        idx = cdef_mi[np.ix_(r0, c0)]
        active = (unit_skip == 0) & (idx >= 0)
        idxc = np.clip(idx, 0, nstr - 1)

        def gate(tbl):
            u = np.asarray(tbl, np.int32)[idxc] << coeff_shift
            return np.where(active, u, 0).astype(np.int32)

        outs = cdef_dev._cdef_all(
            tuple(planes), jnp.asarray(gate(c["y_pri"])),
            jnp.asarray(gate(c["y_sec"])), jnp.asarray(gate(c["uv_pri"])),
            jnp.asarray(gate(c["uv_sec"])), bd,
            c["damping"] + coeff_shift, subx, suby)
        return list(outs)

    def run(self):
        """Full frame on device; returns host planes (int64, like
        FrameRecon.run)."""
        import jax
        planes = self.run_device()
        fetched = jax.device_get(planes)
        return [np.asarray(p).astype(np.int64) for p in fetched]
