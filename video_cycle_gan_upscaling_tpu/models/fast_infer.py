"""Fused-kernel inference runner for the flagship UpscalerOrig.

Same outputs as ``UpscalerOrig.apply`` (phase_tail semantics), rebuilt for
inference speed of light (VERDICT.md round-1 items 2-3):

- the whole 16-block trunk runs W-packed at 128 lanes through the fused
  conv+instance-norm Pallas kernel (ops/pallas/fused_conv.py): one kernel
  per conv, with the previous layer's norm apply / PReLU / residual add
  fused in as a VMEM pre-op — a norm never touches HBM as its own pass;
- trunk conv biases are dropped (per-channel bias cancels in instance
  norm — ops/quant.py invariance note);
- every phase-space tail kernel (transpose convs + final 9x9) is
  rearranged ONCE at prepack time instead of gather-rebuilt inside every
  jitted forward; single-upsample tails run x-packed (free W-pair channel
  fold to full MXU K-lanes, then the 9x9 head as a stride-(2,2) S=(4,8)
  conv straight on that layout — ops/head_conv.py, layout A/Bs in
  docs/PERF.md round 2);
- ``quant=True`` runs the trunk convs W8A8 on the MXU (v5e ~2x bf16
  peak) with in-VMEM activation quantization: the residual stream stays
  bf16 (more accurate than the round-1 turbo's int8 ring), and no int8
  tensor crosses an HBM kernel boundary in the trunk (the round-1
  relayout tax, docs/PERF.md); after ``calibrate()`` the tail also runs
  W8A8 on the same x-packed structure.

Reference semantics: make_upscaler_orig
(/root/reference/upscaling/upscaler/model.py:267-295).
"""

from __future__ import annotations

import math
import os as _os

import numpy as np
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from video_cycle_gan_upscaling_tpu.ops import nn as vops
from video_cycle_gan_upscaling_tpu.ops import subpixel as sp
from video_cycle_gan_upscaling_tpu.ops import head_conv
from video_cycle_gan_upscaling_tpu.ops.pallas import fused_conv as fc
from video_cycle_gan_upscaling_tpu.ops.pallas import norms as pnorms
from video_cycle_gan_upscaling_tpu.ops.pallas import pair_conv
from video_cycle_gan_upscaling_tpu.ops.pallas import phase_up
from video_cycle_gan_upscaling_tpu.ops.pallas import up_conv as upc
from video_cycle_gan_upscaling_tpu.ops.quant import QSCALE

# int8 clip scale for the residual-stream convs (conv_pre inputs): the
# trunk stream grows ~sqrt(depth), so give it the round-1 RSCALE range.
RES_QSCALE = 127.0 / 16.0


def parse_mix_spec(spec: str, res_block_num: int) -> frozenset:
    """``"mix:<spec>"`` -> the set of int8 trunk UNITS for the
    mixed-precision trunk. Unit i in [0, res_block_num) = res block i
    (both of its convs, w_pre_i and w_post_i); unit res_block_num = the
    prefinal conv. Accepted specs: ``lastK`` (the K units nearest the
    output — prefinal first), ``firstK`` (units 0..K-1), or an explicit
    comma list of unit indices (``mix:3,4,16``).

    Rationale (docs/PERF.md round-3/4): quantization error energy is
    ~linear in the number of int8 convs, so between tail8 (0 int8 trunk
    units, 53.8 dB) and full int8 (all units, 44.6 dB) there is a
    fps/quality frontier; the sweep (scripts/mix_trunk_sweep.py) picks
    the fastest point that clears the budget gate."""
    body = spec.split(":", 1)[1] if ":" in spec else spec[3:]
    n_units = res_block_num + 1
    if body.startswith("last"):
        k = int(body[4:])
        return frozenset(range(max(0, n_units - k), n_units))
    if body.startswith("first"):
        k = int(body[5:])
        return frozenset(range(min(k, n_units)))
    units = frozenset(int(t) for t in body.split(",") if t.strip())
    assert all(0 <= u < n_units for u in units), (spec, n_units)
    return units


class FastOrigRunner:
    """Prepacked UpscalerOrig inference: runner = FastOrigRunner(params,...);
    y = jax.jit(runner.apply)(runner.qp, x). ``qp`` is a pure array pytree
    (safe to device_put / donate); all shape plans are static attributes.
    """

    def __init__(self, params: Dict[str, Any], *, res_block_num: int = 16,
                 upscale_factor: int = 4, tile_hw: Tuple[int, int],
                 filters: Optional[int] = None, quant=False,
                 dtype=jnp.bfloat16, stats_mode: Optional[str] = None):
        """``quant``: False = bf16 everywhere; True = W8A8 trunk AND
        (after calibrate()) all-W8A8 tail; "tail" = bf16 trunk + HYBRID
        tail (W8A8 up conv, bf16 head) — the budget mode: the trunk
        dominates full-int8 error and the head stages dominate the
        all-int8 tail's (docs/PERF.md round-3 isolations), so this is
        the fastest mode that clears the ≤0.1 dB budget gate; "tail8" =
        bf16 trunk + ALL-W8A8 tail (head included) — between "tail" and
        True on both axes (the HR intermediate crosses HBM as int8 and
        the head runs at the int8 MXU rate, while the trunk — the
        dominant quantization-error source — stays bf16)."""
        # "+s1" suffix composes bf16-stage-0 with a mixed trunk:
        # "mix:last14+s1" = int8 trunk units + bf16 stage-0 + int8
        # stage-1/head (x4). Bare "tail8:s1" is the bf16-trunk variant.
        s1_suffix = isinstance(quant, str) and quant.endswith("+s1")
        if s1_suffix:
            quant = quant[:-3]
        is_mix = isinstance(quant, str) and quant.startswith("mix")
        # "trunk[:SPEC]": W8A8 trunk units + BF16 tail — the inverse of
        # "tail"/"tail8". Motivated by the round-4 trained-weights
        # finding (docs/PERF.md): on the trained teacher/distilled
        # students the TAIL carries nearly all W8A8 error (student K=8
        # x2: tail8 41.3 dB vs full-int8 40.9 — the trunk adds ~0.4 dB)
        # — the reverse of the random-init statistics every round-3 mode
        # was tuned on.
        is_trunk = isinstance(quant, str) and quant.startswith("trunk")
        # "tail8:s1": tail8 minus the s0 quantization — the x4 stage-0
        # up conv runs BF16 on the unquantized trunk output; the mid
        # stream, stage-1 and head stay W8A8. Motivated by the round-5
        # margin probe: on TRAINED weights the ENTIRE tail8 deficit sits
        # in the s0 (trunk-output) int8 representation (s1/mid/lohi are
        # insensitive to x3 scale inflation), and stage 0 runs at LR —
        # the cheapest place in the x4 chain to spend bf16.
        is_s1 = (quant == "tail8:s1"
                 or (s1_suffix and (is_mix or quant == "tail8")))
        assert (quant in (False, True, "tail", "tail8") or is_mix
                or is_trunk or is_s1), quant
        self.stats_mode = stats_mode  # None -> fused_conv env default
        c = filters or params["initial_conv"]["kernel"].shape[-1]
        self.filters = c
        self.res_block_num = res_block_num
        n_units = res_block_num + 1  # res blocks + the prefinal conv
        if quant is True:
            self.trunk_qset = frozenset(range(n_units))
        elif is_mix:
            # "mix:<spec>": the tail8 tail + a MIXED-precision trunk —
            # the named units run W8A8, the rest bf16 (the fps/quality
            # frontier between tail8 and full int8; docs/PERF.md
            # round-4 candidate 1, sweep: scripts/mix_trunk_sweep.py)
            self.trunk_qset = parse_mix_spec(quant, res_block_num)
        elif is_trunk:
            self.trunk_qset = (parse_mix_spec(quant, res_block_num)
                               if ":" in quant
                               else frozenset(range(n_units)))
        else:
            self.trunk_qset = frozenset()
        self.quant = bool(self.trunk_qset)  # any trunk conv quantized
        self.tail_quant = (quant in (True, "tail", "tail8") or is_mix
                           or is_s1)
        # "tail" (budget mode) runs a HYBRID tail: int8 up conv + bf16
        # head. Stage isolation (scripts/quant_decomp.py) puts ~65% of
        # the all-int8 tail's MSE in the head's input requant + weight
        # rounding; dropping them buys ~+4.5 dB — the margin that clears
        # the ≤0.1 dB budget gate (bench.py) — for ~2 fps. Full turbo
        # (quant=True) keeps the all-int8 tail: its trunk error
        # dominates anyway and speed is its point; "tail8" keeps it too
        # but on the bf16 trunk.
        self.head_quant = quant in (True, "tail8") or is_mix or is_s1
        self.dtype = dtype
        self.times = int(math.log2(upscale_factor))
        assert 2 ** self.times == upscale_factor
        # bf16 stage-0 applies only to x4 chains (at x2 the final up
        # conv IS stage 0, so "tail8:s1" degenerates to plain tail8)
        self.s1_only = is_s1 and self.times == 2

        # --- packing geometry (static, from the tile shape) --------------
        h, w = tile_hw
        pack = max(1, 128 // c)
        while pack > 1 and w % pack:
            pack //= 2
        self.pack = pack
        self.cp = c * pack

        qp: Dict[str, Any] = {
            "stem_w": params["initial_conv"]["kernel"].astype(dtype),
            "stem_b": params["initial_conv"]["bias"],
            "stem_alpha": params["initial_prelu"]["alpha"],
        }
        # blocked stem: the 3-channel input pads to 128 lanes in the
        # conv's tiled layout, so the pixel 9x9 stem ran at ~0.8% MFU
        # (1.70 ms/f at the x2 flagship — round-3 device trace).
        # Folding s^2 pixels into lanes (space_to_depth + rearranged
        # kernel, the head_block trick applied to the INPUT side) cuts
        # the padded MXU work ~9x at s=4. Prepacked host-side.
        self.stem_plan = None
        for s_blk in (4, 2):
            if h % s_blk == 0 and w % s_blk == 0:
                wk_s, self.stem_plan = sp.prepack_same_phase_blocked(
                    params["initial_conv"]["kernel"].astype(jnp.float32),
                    1, s_blk)
                qp["stem_w_b"] = wk_s.astype(dtype)
                self.stem_block = s_blk
                break
        self.pads: Dict[str, Tuple[int, int]] = {}
        # host-side f32 packed masters (quant mode): calibrate() refolds
        # per-channel activation scales into these and re-quantizes
        self._trunk_masters: Dict[str, Any] = {}

        def pack_w(tag, kern):
            q = self._tag_quant(tag)
            mat, pads = fc.pack_conv_kernel(kern, pack, quant=q)
            qp[tag] = mat
            self.pads[tag] = pads
            if q:
                raw, _ = fc.pack_conv_kernel(kern, pack, raw=True)
                self._trunk_masters[tag] = np.asarray(raw, np.float32)

        def tile_c(v):
            return jnp.tile(v.astype(jnp.float32), pack)

        for i in range(res_block_num):
            blk = params[f"res_block_{i}"]
            pack_w(f"w_pre_{i}", blk["conv_pre"]["kernel"])
            pack_w(f"w_post_{i}", blk["conv_post"]["kernel"])
            qp[f"g1_{i}"] = blk["norm_pre"]["scale"].astype(jnp.float32)
            qp[f"b1_{i}"] = blk["norm_pre"]["bias"].astype(jnp.float32)
            qp[f"alpha_{i}"] = tile_c(blk["prelu"]["alpha"])
            qp[f"g2_{i}"] = blk["norm_post"]["scale"].astype(jnp.float32)
            qp[f"b2_{i}"] = blk["norm_post"]["bias"].astype(jnp.float32)
            # per-lane activation quant scales for the quantized convs
            # (calibrate() replaces the static defaults with measured
            # per-channel values — same pytree structure, so no retrace).
            # qs_a_i feeds w_post_i; qs_r_i feeds the conv CONSUMING
            # block i's output (w_pre_{i+1} / w_prefinal).
            if self._tag_quant(f"w_post_{i}"):
                qp[f"qs_a_{i}"] = jnp.full((self.cp,), QSCALE, jnp.float32)
            nxt_tag = (f"w_pre_{i + 1}" if i + 1 < res_block_num
                       else "w_prefinal")
            if self._tag_quant(nxt_tag):
                qp[f"qs_r_{i}"] = jnp.full((self.cp,), RES_QSCALE,
                                           jnp.float32)
        pack_w("w_prefinal", params["prefinal_conv"]["kernel"])
        qp["g_pf"] = params["prefinal_norm"]["scale"].astype(jnp.float32)
        qp["b_pf"] = params["prefinal_norm"]["bias"].astype(jnp.float32)

        # --- prepacked phase tail ----------------------------------------
        # block0=2 runs the first transpose conv on a space_to_depth'd
        # input: K lanes 64 -> 256 on the MXU and the output lands directly
        # in the final conv's blocked layout (no GB-scale space_to_depth of
        # the 256-channel HR tensor). Restricted to one-upsample tails; the
        # padded-tap overhead of blocking grows quadratically with r, so
        # deeper tails keep the r=1 start.
        self.block0 = 2 if (self.times == 1 and h % 2 == 0 and w % 2 == 0) \
            else 1
        gh, gw = h // self.block0, w // self.block0  # tail grid
        w9 = params["final_conv"]["kernel"]
        r = self.block0 * (2 ** self.times)
        self.final_mode = "square"
        extra = 1
        import os as _os

        # asymmetric S=(r,2r) head: folds a free W-pair reshape into the
        # final conv (output lanes 48->96 of 128 for r=4). Measured on v5e
        # (scripts A/B): NEUTRAL at batch 8 and a 2x REGRESSION at batch 4
        # (XLA mishandles the K=8192 [3,2] conv there), so default OFF;
        # VCGU_ASYM_HEAD=1 re-enables for experiments.
        asym_ok = _os.environ.get("VCGU_ASYM_HEAD", "0") == "1"
        if self.block0 == 2 and (gw % 2 == 0) and asym_ok:
            self.final_mode = "asym"
        qp["final_b"] = params["final_conv"]["bias"]

        # x-packed tail (the shipped fast path, bf16 AND int8): W-pairs of
        # the r=1 canonical trunk output fold into channels by a free
        # reshape (full 128 K-lanes at 1.33x FLOP padding vs 5.8x for the
        # r=2-blocked transpose kernel), and the 9x9 head runs in the
        # stride-(2,2) S=(4,8) form straight on that layout (96 of 128
        # output lanes, zero relayouts — ops/head_conv.py; layout A/Bs in
        # docs/PERF.md). times==2 (x4 — the reference's own demo factor,
        # example_frame_test.ipynb 480x270->1080p) CHAINS the structure:
        # stage-0 pair up conv at LR, one cheap transpose to the
        # canonical 2x stream, then the identical stage-1 tail. The
        # r-blocked path below serves the remaining configs (deeper
        # tails, odd tiles, the asym experiment).
        self.xpack_ready = (self.final_mode == "square" and h % 2 == 0
                            and ((self.times == 1 and w % 4 == 0)
                                 or (self.times == 2 and w % 2 == 0)))
        if not self.xpack_ready and self.block0 == 1:
            for e in (4, 2):
                if gh % e == 0 and gw % e == 0:
                    extra = e
                    break
        self.extra = extra
        self.up_plans = []
        self.up_fused = False
        self.up_exact = False
        self.up_groups = None
        self._tail_masters: Dict[str, Any] = {}
        if self.xpack_ready:
            if self.times == 2:
                # x4 chain stage 0: the SAME pair-conv structure as the
                # stage-1 up conv, evaluated at LR; its packed output
                # unfolds to the canonical 2x stream by one transpose
                # (_up0_to_canonical) and stage 1 below proceeds
                # unchanged at (2h, 2w).
                up0 = params["upscale_0"]["conv_transp"]
                wp0, (q0y, q0x), (n0y, n0x) = sp._rearrange_transpose_kernel(
                    up0["kernel"].astype(jnp.float32), 2)
                wk0, p0y, p0x = sp.rearrange_same_kernel_axes(
                    wp0, 1, 2, P_y=q0y, P_x=q0x)
                self.up0_pads = (p0y, p0x)
                # NOTE (round-3 negative result): permuting the emit
                # lanes py-major so the canonical unfold becomes one
                # plain row-interleave measured SLOWER end-to-end
                # (x4 tail8 clip 58.03 -> 54.2 fps) even though the
                # profiler showed the natural (u',py,px,c) order costs
                # two full copies of the mid stream — XLA's holistic
                # layout assignment absorbs the 7-d transpose better
                # than the "cheap" swapaxes. Keep the natural order.
                qp["up0_w_x"] = wk0.astype(dtype)
                qp["up0_b"] = up0["bias"]
                self.c_mid = up0["kernel"].shape[-1]
            up = params[f"upscale_{self.times - 1}"]["conv_transp"]
            qp["up_b_0"] = up["bias"]
            c_up = up["kernel"].shape[-1]
            wp_k, (q_y, q_x), (n_y, n_x) = sp._rearrange_transpose_kernel(
                up["kernel"].astype(jnp.float32), 2)
            wk1, pads_y1, pads_x1 = sp.rearrange_same_kernel_axes(
                wp_k, 1, 2, P_y=q_y, P_x=q_x)
            self.up_pads_q = (pads_y1, pads_x1)
            wd, self.final_px_q = head_conv.prepack_head_s48(
                w9.astype(jnp.float32), c_up)
            qp["up_w_x"] = wk1.astype(dtype)
            qp["head_w_x"] = wd.astype(dtype)
            # fused Pallas up conv on the UNPACKED [n_y,n_x,C,4C'] phase
            # kernel (2/3 of the pair form's contraction FLOPs) measured
            # SLOWER than XLA's pair conv end-to-end on v5e (33.7 vs
            # 37.4 fps — per-step overhead + epilogue serialization,
            # docs/PERF.md round 3); kept env-gated for experiments.
            self.up_fused = (_os.environ.get("VCGU_UP_FUSED", "0") == "1"
                             and self.times == 1 and n_y == 3 and q_y == 1)
            if self.up_fused:
                self.up_px = (q_x, n_x - 1 - q_x)
                qp["up_w_p"] = wp_k.reshape(
                    n_y, n_x * wp_k.shape[2], 4 * c_up).astype(dtype)
            if self.tail_quant:
                self._tail_masters = {
                    "up_pair": np.asarray(wk1, np.float32),
                    "up_unpacked": np.asarray(wp_k, np.float32).reshape(
                        n_y, n_x * wp_k.shape[2], 4 * c_up),
                    "head": np.asarray(wd, np.float32),
                }
                if self.times == 2:
                    self._tail_masters["up0_pair"] = np.asarray(
                        wk0, np.float32)
            # exact-phase stage-1: one conv PER OUTPUT PHASE on the
            # unpacked stream, each sliced to its true tap support —
            # 25C taps/HR-pixel total vs the pair form's 48C (1.92x
            # structural padding; the pair form already runs at ~87% of
            # ITS roofline, so the win is formulation). Measured on v5e
            # (scripts/exact_up_ab.py): x4 tail8 26.42 -> 17.44 ms/f
            # (-34%), x4 hybrid 29.61 -> 20.18, identical quality; at
            # x2 the 64ch input underutilizes the small per-phase convs
            # (31.92 -> 32.78, slightly worse) — so exact is the x4
            # (times==2) default, pair the x2 default; VCGU_EXACT_UP=1/0
            # overrides. Phase lane order (py,px,c) matches the pair
            # form's folded s1.
            _exact_env = _os.environ.get("VCGU_EXACT_UP")
            self.up_exact = self.tail_quant and (
                _exact_env == "1"
                or (_exact_env != "0" and self.times == 2))
            if self.up_exact:
                wpn = np.asarray(wp_k, np.float32)  # [n_y,n_x,C,4C']
                phases = []
                for ph in range(4):
                    blk = wpn[..., ph * c_up:(ph + 1) * c_up]
                    ys = [ky for ky in range(n_y) if np.any(blk[ky])]
                    xs = [kx for kx in range(n_x) if np.any(blk[:, kx])]
                    a0, y1_ = ys[0], ys[-1] + 1
                    b0, x1_ = xs[0], xs[-1] + 1
                    pads = ((int(q_y - a0), int(y1_ - 1 - q_y)),
                            (int(q_x - b0), int(x1_ - 1 - q_x)))
                    phases.append((blk[a0:y1_, b0:x1_], pads))
                self._tail_masters["up_phases"] = phases
                self.up_phase_pads = [p for _, p in phases]
                # static tap metadata for the one-pass Pallas form
                # (ops/pallas/phase_up.py): (phase, oy, ox) per true tap
                self.up_tap_meta = []
                for ph, (blk_w, pads) in enumerate(phases):
                    (pyl, _), (pxl, _) = pads
                    for dy in range(blk_w.shape[0]):
                        for dx in range(blk_w.shape[1]):
                            self.up_tap_meta.append(
                                (ph, dy - pyl, dx - pxl))
                self.up_pallas = _os.environ.get(
                    "VCGU_PHASE_UP", "0") == "1"
                # grouped stage-1: per-phase convs sharing a ROW support
                # pair into ONE conv over the union column window (member
                # kernels at their column offsets, structural zeros
                # elsewhere): 30C taps/HR-pixel padded vs exact's 25C
                # (1.2x, still far under the pair form's 48C) but HALF
                # the conv dispatches, epilogues, int8 emits, and head
                # acc convs. Output lanes member-major [.., 2cq]; the
                # head consumes each group through
                # head_conv.head_group_lane_slice, and the grouped int8
                # kernels are sliced from the quantized per-phase ones
                # (_refold_tail), so output is BIT-IDENTICAL to the
                # exact-phase form. VCGU_GROUP_UP=1/0 overrides (default
                # pending the TPU A/B — docs/PERF.md round 3).
                by_rows: Dict[Any, list] = {}
                for ph, (blk, pads) in enumerate(phases):
                    by_rows.setdefault((blk.shape[0], pads[0]),
                                       []).append(ph)
                grps = sorted(tuple(v) for v in by_rows.values())
                if (_os.environ.get("VCGU_GROUP_UP", "0") == "1"
                        and not self.up_pallas and len(grps) == 2
                        and all(len(g) == 2 for g in grps)):
                    self.up_groups = []
                    for pa, pb in grps:
                        (blka, pdsa), (blkb, pdsb) = phases[pa], phases[pb]
                        b0a = int(q_x) - pdsa[1][0]
                        b0b = int(q_x) - pdsb[1][0]
                        b0u = min(b0a, b0b)
                        x1u = max(b0a + blka.shape[1],
                                  b0b + blkb.shape[1])
                        self.up_groups.append(dict(
                            phases=(pa, pb),
                            pads=(pdsa[0], (int(q_x) - b0u,
                                            x1u - 1 - int(q_x))),
                            uy=blka.shape[0], ux=x1u - b0u,
                            offs=(b0a - b0u, b0b - b0u)))
                    if not self.head_quant:
                        for g, gr in enumerate(self.up_groups):
                            idx = head_conv.head_group_lane_slice(
                                c_up, *gr["phases"])
                            qp[f"head_w_x_g{g}"] = jnp.asarray(
                                np.asarray(wd, np.float32)[:, :, idx, :],
                                dtype)
                if not self.head_quant:
                    # hybrid exact: per-phase lane slices of the bf16
                    # head kernel (the quant-head slices are built from
                    # the quantized kernel in _refold_tail)
                    for ph in range(4):
                        idx = head_conv.head_lane_slice(c_up, ph)
                        qp[f"head_w_x_ph{ph}"] = jnp.asarray(
                            np.asarray(wd, np.float32)[:, :, idx, :],
                            dtype)
        else:
            rr = self.block0
            for i in range(self.times):
                up = params[f"upscale_{i}"]["conv_transp"]
                wk, plan = sp.prepack_transpose_phase(up["kernel"], 2, rr)
                qp[f"up_w_{i}"] = wk.astype(dtype)
                qp[f"up_b_{i}"] = up["bias"]
                self.up_plans.append(plan)
                rr *= 2
            if self.final_mode == "asym":
                # The W-pair lane order ((wx, ay, bx, c)) vs the canonical
                # (r, 2r) order ((ay, r*wx+bx, c)) is a pure channel
                # permutation, folded into the kernel's input axis.
                c_up = w9.shape[-2]
                wk, pads_y, pads_x = sp.rearrange_same_kernel_axes(
                    w9, r, 2 * r)
                j = np.arange(2 * r * r * c_up)
                wx, rem = j // (r * r * c_up), j % (r * r * c_up)
                ay, rem = rem // (r * c_up), rem % (r * c_up)
                bx, c_ = rem // c_up, rem % c_up
                k = (ay * (2 * r) + r * wx + bx) * c_up + c_
                wk = wk[:, :, k, :]
                qp["final_w"] = wk.astype(dtype)
                self.final_pads = (pads_y, pads_x)
            else:
                wk, plan = sp.prepack_same_phase_blocked(w9, r, extra)
                qp["final_w"] = wk.astype(dtype)
                self.final_plan = plan

        # --- int8 tail (quant mode, after calibrate()) --------------------
        # The tail convs are the post-trunk bottleneck; W8A8 doubles their
        # MXU rate on the same x-packed structure as the bf16 tail, and
        # the big phase intermediate becomes int8 (half HBM).
        # Weights: symmetric per-out-channel scales on the prepacked phase
        # kernels. Activations: per-tensor scales measured by calibrate()
        # on a real frame; until calibrated the tail runs the bf16 x-pack.
        self.tail_quant_ready = False
        self.tail_calibrated = False
        self.trunk_calibrated = False  # per-channel trunk refold done
        # Asymmetric head-input quantization (tail8/full-int8 tails):
        # the stage-1 stream is post-LeakyReLU, so its per-channel range
        # is skewed (~[-0.2m, m]); a per-channel integer zero point
        # recovers the wasted half of the int8 range (~1.67x finer
        # steps, ~+4 dB on the head-input requant — the stage carrying
        # ~65% of the all-int8 tail MSE, scripts/quant_decomp.py). The
        # emit subtracts zp; the head conv is corrected EXACTLY
        # (borders included) by a precomputed bias MAP (see
        # _head_zp_bias_map). Off for the env-gated up_fused/phase_up
        # experiment paths (their emits are symmetric-only).
        self.head_zp = (self.head_quant and self.tail_quant
                        and self.xpack_ready and not self.up_fused
                        and not getattr(self, "up_pallas", False)
                        and _os.environ.get("VCGU_HEAD_ZP", "1") != "0")
        if self.tail_quant and self.xpack_ready:
            # NOTE: tail_s0/tail_s1 (and up_w_q/final_w_q) appear only
            # via calibrate() — tail selection keys on the qp pytree
            # STRUCTURE, so jit retraces when (and only when) a
            # calibrated qp is passed; a stale or discarded-return qp
            # safely keeps the bf16 tail instead of dividing by a zero
            # scale. calibrate() folds per-channel activation scales
            # into the f32 masters (host-side) and re-quantizes.
            self.tail_quant_ready = True
        self.qp = qp

    def _tag_quant(self, tag: str) -> bool:
        """Does trunk conv ``tag`` (w_pre_i / w_post_i / w_prefinal) run
        W8A8? Unit mapping: block i owns w_pre_i and w_post_i; the
        prefinal conv is unit res_block_num (parse_mix_spec)."""
        if not self.trunk_qset:
            return False
        if tag == "w_prefinal":
            return self.res_block_num in self.trunk_qset
        return int(tag.rsplit("_", 1)[1]) in self.trunk_qset

    # -------------------------------------------------------- calibration
    def calibrate(self, qp: Dict[str, Any], x: jax.Array,
                  tail_clip="auto", trunk_clip: float = 1.0
                  ) -> Dict[str, Any]:
        """Measure per-CHANNEL activation quant scales on a sample batch
        and fold them into the prepacked int8 weights (quant modes).

        ``tail_clip``: ratio applied to the measured tail abs-maxes
        before the scale fold — <1 trades outlier clipping for a finer
        rounding grid everywhere else. Round 3 measured every ratio <1
        WORSE on the random-init model (outlier-free statistics); on
        TRAINED weights the tail activations are outlier-heavy and
        abs-max scales cost ~10 dB (docs/PERF.md round 4), so the
        default "auto" evaluates a small ratio grid against the bf16
        path ON THE CALIBRATION BATCH and keeps the best (selection
        never sees held-out content; quality gates re-decide per run).

        Trunk (quant=True): per-layer per-lane abs-max of every
        quantized conv input replaces the static QSCALE/RES_QSCALE
        vectors, and the packed kernels are re-quantized from their f32
        masters with the scales folded into the input axes — the qp
        pytree STRUCTURE is unchanged, so existing jitted applies reuse
        their trace.

        Tail (quant=True or "tail"): returns qp with tail_s0/tail_s1
        ADDED — the structure change is the tail selector (apply_tail
        docstring); a stale/discarded qp safely keeps the bf16 tail.

        NOT safe to wrap in jax.jit when quant=True (host-side weight
        refold); call it plain — internals jit themselves.

        Multi-frame ``x`` is processed ONE FRAME AT A TIME: the
        calibration graphs (amax probes, bias-error probe, the auto-clip
        applies) at HR geometry exceed HBM beyond batch 1 (measured
        23.98G for a 3-frame x4 batch, round 5), and per-frame
        aggregation is exact — elementwise max for amaxes, summed MSE
        for clip selection, mean for the bias correction — while reusing
        the batch-1 traces the bench compiles anyway."""
        xs = [x[i:i + 1] for i in range(x.shape[0])]
        if self.quant:
            fn_am = jax.jit(self._stem_trunk_amax)
            amaxes = None
            for xi in xs:
                am = jax.device_get(fn_am(qp, xi)[1])
                amaxes = am if amaxes is None else {
                    k: np.maximum(np.asarray(amaxes[k], np.float32),
                                  np.asarray(am[k], np.float32))
                    for k in am}
            qp = dict(qp)
            for i in range(self.res_block_num):
                tgt = {"qs_a": f"w_post_{i}",
                       "qs_r": (f"w_pre_{i + 1}"
                                if i + 1 < self.res_block_num
                                else "w_prefinal")}
                for kind, w_tag in tgt.items():
                    if w_tag not in self._trunk_masters:
                        continue  # bf16 conv in a mixed-precision trunk
                    tag = f"{kind}_{i}"
                    qs = 127.0 / np.maximum(
                        np.asarray(amaxes[tag], np.float32) * trunk_clip,
                        1e-6)
                    qp[tag] = jnp.asarray(qs)
                    qp[w_tag] = fc.quantize_packed_kernel(
                        self._trunk_masters[w_tag], in_scales=qs,
                        out_pack=self.pack)
            self.trunk_calibrated = True
        if not self.tail_quant_ready:
            return qp
        if tail_clip == "auto" and _os.environ.get("VCGU_TAIL_CLIP"):
            # override hook; tests pin 1.0 (the auto grid costs 5 tail
            # re-calibrations + applies — minutes in interpret mode)
            tail_clip = float(_os.environ["VCGU_TAIL_CLIP"])
        fn_tam = jax.jit(self._tail_amax)

        def agg(i, a, b):
            if i == 2:  # lohi1: row 0 is the signed MIN, row 1 the MAX
                return np.stack([np.minimum(a[0], b[0]),
                                 np.maximum(a[1], b[1])])
            return np.maximum(a, b)

        amaxes = None
        for xi in xs:
            am = [np.asarray(a, np.float32)
                  for a in jax.device_get(fn_tam(qp, xi))]
            amaxes = am if amaxes is None else [
                agg(i, a, b) for i, (a, b) in enumerate(zip(amaxes, am))]

        def clipped(clip):
            return [a * clip for a in amaxes]

        if tail_clip == "auto":
            # pick the clip ratio that best reproduces this runner's own
            # bf16-tail output on the calibration batch (uncalibrated qp
            # lacks tail_s0, so apply() runs the bf16 tail)
            fn = jax.jit(self.apply)  # one trace: candidates share structure
            refs = [np.asarray(fn(qp, xi), np.float32) for xi in xs]
            best = (None, np.inf, 1.0)
            for clip in (1.0, 0.85, 0.7, 0.55, 0.4, 0.28, 0.2):
                cand = self._finish_tail_calibration(dict(qp),
                                                     clipped(clip), xs)
                mse = sum(
                    float(np.mean((np.asarray(fn(cand, xi), np.float32)
                                   - r) ** 2))
                    for xi, r in zip(xs, refs))
                if mse < best[1]:
                    best = (cand, mse, clip)
            if (_os.environ.get("VCGU_TAIL_PC", "1") == "1"
                    and not self.s1_only):  # s1 modes never consume s0
                # PER-CHANNEL clip candidate (docs/PERF.md round-5
                # lead 1b): each channel keeps the grid ratio minimizing
                # its own local quantization MSE on the calibration
                # batch (outlier channels keep wide scales, clean
                # channels get a finer grid), competing against the
                # global-ratio candidates under the same end-to-end
                # calibration-MSE selection — still calibration-only;
                # the held-out quality gates re-decide per run.
                try:
                    pc = self._select_pc_amaxes(qp, xs, amaxes)
                    cand = self._finish_tail_calibration(dict(qp), pc, xs)
                    mse = sum(
                        float(np.mean((np.asarray(fn(cand, xi), np.float32)
                                       - r) ** 2))
                        for xi, r in zip(xs, refs))
                    if mse < best[1]:
                        best = (cand, mse, "pc")
                except Exception as e:  # pragma: no cover — never block
                    import sys as _sys

                    print(f"per-channel clip candidate failed: "
                          f"{type(e).__name__}: {e}", file=_sys.stderr)
            qp, _, self.tail_clip_selected = best
        else:
            qp = self._finish_tail_calibration(dict(qp),
                                               clipped(float(tail_clip)), xs)
            self.tail_clip_selected = float(tail_clip)
        self.tail_calibrated = True
        return qp

    def _finish_tail_calibration(self, qp: Dict[str, Any], amaxes,
                                 xs) -> Dict[str, Any]:
        qp = self._refold_tail(qp, *amaxes)
        # per-channel bias correction: fold the int8 path's systematic
        # (mean) pre-activation error on the calibration batch into the
        # stage biases — corrects quantizer rounding bias at zero
        # runtime cost (default path only; the env-gated fused-up-conv
        # experiment skips it). ``xs``: list of equal-size frame slices;
        # the correction is the mean over all of them.
        if not (self.up_fused and self.head_quant):
            w_phases = [jnp.asarray(w) for w, _ in
                        self._tail_masters.get("up_phases", [])]
            fn_err = jax.jit(self._tail_bias_err)
            errs = [fn_err(qp, xi, jnp.asarray(self._tail_masters["up_pair"]),
                           jnp.asarray(self._tail_masters["head"]), *w_phases)
                    for xi in xs]
            err0, err1, err2 = (sum(np.asarray(e[i], np.float32)
                                    for e in errs) / len(errs)
                                for i in range(3))
            if self.times == 2 and not self.s1_only:
                qp["up0_b_c"] = qp["up0_b_c"] - err0
            if self.up_exact:
                qp["upx_b_c"] = qp["upx_b_c"] - err1
            else:
                qp["up_b_c"] = qp["up_b_c"] - err1
            if self.head_quant:
                qp["final_b_c"] = qp["final_b_c"] - err2
        if self.head_zp and "tail_zp1" in qp:
            # exact (border-aware) zero-point correction for the head
            # conv, folded with the (bias-corrected) head bias into one
            # map — built AFTER the err2 subtraction above
            qp["final_b_map"] = jax.jit(
                self._head_zp_bias_map, static_argnums=(1, 2))(
                    qp, xs[0].shape[1], xs[0].shape[2])
        return qp

    def _head_zp_bias_map(self, qp, th: int, tw: int):
        """Head-conv zero-point correction, exact at borders.

        The head consumes q1 = round(y*s1) - zp1 per input lane; the
        symmetric-equivalent accumulator is acc + conv(zp_map, w_q),
        where the conv's zero padding automatically restricts the
        correction to in-bounds taps (out-of-bounds means y=0
        contributes nothing, matching the f32 head's SAME padding).
        zp1 is integer and |zp1| is capped, so the int32 conv is exact.
        Returns bias_map [1,Ho,Wo,96] = corr*ws + final_b_c, consumed in
        place of the [96] bias vector. Shape-coupled to the calibration
        frame's geometry (== the runner's tile_hw by contract)."""
        mh = th * (2 if self.times == 2 else 1)
        mw = tw * (2 if self.times == 2 else 1)
        c8 = qp["final_w_q"].shape[2]
        zp_map = jnp.broadcast_to(
            jnp.tile(qp["tail_zp1"], 2).astype(jnp.int32),
            (1, mh, mw // 2, c8))
        corr = head_conv.head_conv_s48_acc(
            zp_map, qp["final_w_q"].astype(jnp.int32), self.final_px_q)
        return (corr.astype(jnp.float32) * qp["final_w_ws"]
                + qp["final_b_c"])

    def _tail_bias_err(self, qp, x, w_up_f, w_head_f, *w_phases):
        """Mean pre-activation error of the calibrated int8 tail vs the
        f32 tail on the sample batch: (err_up0 [8*c_mid] — zeros for x2,
        err_up [8*C_up] (pair) or [4*C_up] (exact-phase), err_head
        [96]). The quantized side mirrors the runtime chain (each stage
        consumes the previous QUANTIZED stage's bias-corrected
        output)."""
        trunk = self.apply_trunk(qp, self.apply_stem(qp, x))
        n, h, wp_, cp = trunk.shape
        y = trunk.reshape(n, h, wp_ * self.pack, self.filters
                          ).astype(jnp.float32)
        s0, s1 = qp["tail_s0"], qp["tail_s1"]
        if self.times == 2 and self.s1_only:
            # bf16 stage-0 ("tail8:s1"): both chains share the f32
            # stage-0 conv; the quantized side only sees the runtime's
            # bf16 rounding of the mid stream. No up0 bias correction.
            b0_8 = jnp.tile(qp["up0_b"], 8).astype(jnp.float32)
            yp = y.reshape(n, h, (wp_ * self.pack) // 2, 2 * self.filters)
            acc0_f = lax.conv_general_dilated(
                yp, jnp.asarray(self._tail_masters["up0_pair"]), (1, 1),
                self.up0_pads, dimension_numbers=sp.CONV_DIMS)
            z0 = vops.leaky_relu(acc0_f + b0_8, 0.2)
            y_f = self._up0_to_canonical(z0)
            y_q = y_f.astype(jnp.bfloat16).astype(jnp.float32)
            err0 = jnp.zeros_like(b0_8)
            s_in = qp["tail_sm"]
        elif self.times == 2:
            b0_8 = jnp.tile(qp["up0_b"], 8).astype(jnp.float32)
            q0 = jnp.clip(jnp.round(y * s0), -127, 127).astype(jnp.int8)
            yp = y.reshape(n, h, (wp_ * self.pack) // 2, 2 * self.filters)
            acc0_f = lax.conv_general_dilated(
                yp, jnp.asarray(self._tail_masters["up0_pair"]), (1, 1),
                self.up0_pads, dimension_numbers=sp.CONV_DIMS)
            acc0_q = lax.conv_general_dilated(
                q0.reshape(yp.shape), qp["up0_w_q"], (1, 1),
                self.up0_pads, dimension_numbers=sp.CONV_DIMS,
                preferred_element_type=jnp.int32
            ).astype(jnp.float32) * qp["up0_w_ws"]
            err0 = jnp.mean(acc0_q - acc0_f, axis=(0, 1, 2))
            # mirror the runtime stage-0 emit rounding on the quantized
            # side: the pair and hybrid stage-1 paths emit bf16 and
            # transpose in bf16; the exact+head_quant (tail8) path
            # re-quantizes in f32 inside the kernel (no bf16
            # intermediate)
            z0 = vops.leaky_relu(acc0_q + b0_8 - err0, 0.2)
            if not (self.up_exact and self.head_quant):
                z0 = z0.astype(jnp.bfloat16)
            y_q = self._up0_to_canonical(z0).astype(jnp.float32)
            y_f = self._up0_to_canonical(
                vops.leaky_relu(acc0_f + b0_8, 0.2))
            s_in = qp["tail_sm"]
        else:
            err0 = jnp.zeros((8 * qp["up_b_0"].shape[0],), jnp.float32)
            y_q = y_f = y
            s_in = s0
        q0 = jnp.clip(jnp.round(y_q * s_in), -127, 127).astype(jnp.int8)
        nn_, hh_, ww_, cc_ = y_f.shape
        if self.up_exact:
            # exact-phase chain: per-phase accs, concatenated (py,px,c)
            cq = w_phases[0].shape[-1]
            acc_q = jnp.concatenate([
                lax.conv_general_dilated(
                    q0, qp[f"upx{ph}_w_q"], (1, 1), self.up_phase_pads[ph],
                    dimension_numbers=sp.CONV_DIMS,
                    preferred_element_type=jnp.int32
                ).astype(jnp.float32) * qp[f"upx{ph}_ws"]
                for ph in range(4)], axis=-1)
            acc_f = jnp.concatenate([
                lax.conv_general_dilated(
                    y_f, w_phases[ph], (1, 1), self.up_phase_pads[ph],
                    dimension_numbers=sp.CONV_DIMS)
                for ph in range(4)], axis=-1)
            err1 = jnp.mean(acc_q - acc_f, axis=(0, 1, 2))  # [4C']
            if not self.head_quant:
                return err0, err1, jnp.zeros(
                    (32 * qp["final_b"].shape[0],), jnp.float32)
            b4 = jnp.tile(qp["up_b_0"], 4).astype(jnp.float32)
            y1_q = vops.leaky_relu(acc_q + b4 - err1, 0.2)
            y1_f = vops.leaky_relu(acc_f + b4, 0.2)
            zq1 = y1_q * s1
            if "tail_zp1" in qp:  # mirror the asymmetric runtime emit
                zq1 = zq1 - qp["tail_zp1"]
            q1 = jnp.clip(jnp.round(zq1), -127, 127).astype(jnp.int8)
            q1 = q1.reshape(nn_, hh_, ww_ // 2, 8 * cq)
            y1_f = y1_f.reshape(nn_, hh_, ww_ // 2, 8 * cq)
        else:
            b8 = jnp.tile(qp["up_b_0"], 8).astype(jnp.float32)
            yp_f = y_f.reshape(nn_, hh_, ww_ // 2, 2 * cc_)
            q0p = q0.reshape(yp_f.shape)
            acc_f = lax.conv_general_dilated(
                yp_f, w_up_f, (1, 1), self.up_pads_q,
                dimension_numbers=sp.CONV_DIMS)
            acc_q = lax.conv_general_dilated(
                q0p, qp["up_w_q"], (1, 1), self.up_pads_q,
                dimension_numbers=sp.CONV_DIMS,
                preferred_element_type=jnp.int32
            ).astype(jnp.float32) * qp["up_w_ws"]
            err1 = jnp.mean(acc_q - acc_f, axis=(0, 1, 2))
            if not self.head_quant:   # hybrid tail: bf16 head, no err2
                return err0, err1, jnp.zeros(
                    (32 * qp["final_b"].shape[0],), jnp.float32)
            y1_q = vops.leaky_relu(acc_q + b8 - err1, 0.2)
            y1_f = vops.leaky_relu(acc_f + b8, 0.2)
            zq1 = y1_q * jnp.tile(s1, 2)
            if "tail_zp1" in qp:  # mirror the asymmetric runtime emit
                zq1 = zq1 - jnp.tile(qp["tail_zp1"], 2)
            q1 = jnp.clip(jnp.round(zq1), -127, 127).astype(jnp.int8)
        zeros96 = jnp.zeros((32 * qp["final_b"].shape[0],), jnp.float32)
        hd_q = head_conv.head_conv_s48_pre(q1, qp["final_w_q"],
                                           qp["final_w_ws"], zeros96,
                                           self.final_px_q)
        if "tail_zp1" in qp:
            # the runtime head adds the zp correction map — include it
            # here so err2 measures only residual quantizer bias
            zp_map = jnp.broadcast_to(
                jnp.tile(qp["tail_zp1"], 2).astype(jnp.int32),
                (1,) + q1.shape[1:])
            corr = head_conv.head_conv_s48_acc(
                zp_map, qp["final_w_q"].astype(jnp.int32),
                self.final_px_q)
            hd_q = hd_q + corr.astype(jnp.float32) * qp["final_w_ws"]
        hd_f = head_conv.head_conv_s48_pre(y1_f.astype(jnp.float32),
                                           w_head_f, None, zeros96,
                                           self.final_px_q)
        err2 = jnp.mean(hd_q - hd_f, axis=(0, 1, 2))
        return err0, err1, err2

    def _stem_trunk_amax(self, qp, x):
        return self.apply_trunk(qp, self.apply_stem(qp, x),
                                collect_amax=True)

    def _tail_amax(self, qp: Dict[str, Any], x: jax.Array):
        """Per-channel abs-max of each quantized tail activation on the
        sample batch: the trunk output ([C]); for x4 chains also the
        canonical mid stream ([c_mid]); and the post-LeakyReLU final
        up-conv output (pair slots folded -> [4*C_up]). Order matches
        _refold_tail's (amax0, amax1[, amax_mid]) signature."""
        trunk = self.apply_trunk(qp, self.apply_stem(qp, x))
        n, h, wp_, cp = trunk.shape
        y = trunk.reshape(n, h, wp_ * self.pack, self.filters
                          ).astype(jnp.float32)
        amax0 = jnp.maximum(jnp.max(jnp.abs(y), axis=(0, 1, 2)), 1e-6)
        amax_mid = None
        if self.times == 2:
            # bf16 cast mirrors the runtime mid stream (pair_conv_fused
            # stage-0 output + bf16 canonical transpose)
            y = self._up0_to_canonical(self._up_xpack(
                y, qp["up0_w_x"].astype(jnp.float32), qp["up0_b"],
                pads=self.up0_pads)).astype(jnp.bfloat16
                                            ).astype(jnp.float32)
            amax_mid = jnp.maximum(
                jnp.max(jnp.abs(y), axis=(0, 1, 2)), 1e-6)
        y1 = self._up_xpack(y, qp["up_w_x"].astype(jnp.float32),
                            qp["up_b_0"]).astype(jnp.float32)
        a1 = jnp.max(jnp.abs(y1), axis=(0, 1, 2))        # [2*4*C_up]
        cs = a1.shape[0] // 2
        amax1 = jnp.maximum(jnp.maximum(a1[:cs], a1[cs:]), 1e-6)
        # signed per-channel range of the post-LeakyReLU stream (pair
        # slots folded) — the asymmetric head-input quantizer's
        # observable (head_zp)
        lo = jnp.min(y1, axis=(0, 1, 2))
        hi = jnp.max(y1, axis=(0, 1, 2))
        lohi1 = jnp.stack([jnp.minimum(lo[:cs], lo[cs:]),
                           jnp.maximum(hi[:cs], hi[cs:])])
        if amax_mid is None:
            return amax0, amax1, lohi1
        return amax0, amax1, lohi1, amax_mid

    PC_RATIOS = (1.0, 0.85, 0.7, 0.55, 0.4, 0.28)

    def _s0_clip_errs(self, qp, x, amax0):
        """Per-channel LOCAL quantization MSE of the s0 stream (trunk
        output — the stage the margin probe localized the whole trained-
        weights tail deficit to, docs/PERF.md round 5) for every
        PC_RATIOS candidate, on one frame: err0[R, C]. Symmetric
        round-to-nearest — the runtime s0 grain. s1/mid/lohi stay on the
        global clip: the margin probe measured the output INSENSITIVE to
        them (x3 inflation moved nothing), so per-channel selection
        there buys noise, and keeping the probe trunk-only keeps this
        graph's compile small."""
        trunk = self.apply_trunk(qp, self.apply_stem(qp, x))
        n, h, wp_, cp = trunk.shape
        z = trunk.reshape(n, h, wp_ * self.pack, self.filters
                          ).astype(jnp.float32)
        out = []
        for r in self.PC_RATIOS:
            s = 127.0 / jnp.maximum(amax0 * r, 1e-6)
            q = jnp.clip(jnp.round(z * s), -127.0, 127.0) / s
            out.append(jnp.mean((q - z) ** 2, axis=(0, 1, 2)))
        return jnp.stack(out)

    def _select_pc_amaxes(self, qp, xs, amaxes):
        """Per-channel s0 clip selection: each trunk-output channel
        keeps the PC_RATIOS member minimizing its local quantization MSE
        summed over the calibration frames. Returns a copy of ``amaxes``
        with amax0 clipped per channel."""
        amax0 = amaxes[0]
        fn = jax.jit(self._s0_clip_errs)
        tot = None
        for xi in xs:
            e = np.asarray(jax.device_get(fn(qp, xi, jnp.asarray(amax0))),
                           np.float32)
            tot = e if tot is None else tot + e
        ratios = np.asarray(self.PC_RATIOS, np.float32)
        out = list(amaxes)
        out[0] = amax0 * ratios[np.argmin(tot, axis=0)]
        return out

    def _refold_tail(self, qp: Dict[str, Any], amax0, amax1,
                     lohi1=None, amax_mid=None):
        """Per-CHANNEL activation scales folded into the f32 tail-weight
        masters' input axes (host numpy), then per-out-channel int8
        re-quantization — channel-calibrated quantization costs zero
        extra runtime ops (the dequant stays one per-out-channel
        multiply). Round-2's per-TENSOR scales measured 42.1 dB (tail
        only) on the real demo frame; the channel fold reaches ~46 dB."""
        s0 = 127.0 / np.maximum(np.asarray(amax0, np.float32), 1e-6)
        zp1 = None
        if self.head_zp and lohi1 is not None:
            # asymmetric head-input quantizer: q = round(y*s1 - zp1),
            # zp1 integer. The asymmetric gain is capped at 8x the
            # symmetric scale (dead/near-constant channels would
            # otherwise blow zp up); |zp1| <= ~1020 keeps the int32
            # correction conv (_head_zp_bias_map) overflow-free.
            lo = np.asarray(lohi1[0], np.float32)
            hi = np.asarray(lohi1[1], np.float32)
            absmax = np.maximum(np.maximum(np.abs(lo), np.abs(hi)), 1e-6)
            span = np.maximum(hi - lo, 1e-6)
            s1 = np.minimum(254.0 / span, 8.0 * 127.0 / absmax)
            zp1 = np.rint((hi + lo) * 0.5 * s1).astype(np.float32)
            # int32 safety of the correction conv: |corr| <= taps(24) *
            # lanes(2*len) * 127 * |zp|; channels past the cap fall
            # back to symmetric (pathological near-constant channels)
            zp_cap = 0.9 * 2.0 ** 31 / (24.0 * 2 * len(span) * 127.0)
            bad = np.abs(zp1) > zp_cap
            if bad.any():
                s1 = np.where(bad, 127.0 / absmax, s1)
                zp1 = np.where(bad, 0.0, zp1).astype(np.float32)
        else:
            s1 = 127.0 / np.maximum(np.asarray(amax1, np.float32), 1e-6)

        def q_oc(w, in_scales, in_axis):
            sh = [1] * w.ndim
            sh[in_axis] = -1
            w = w / in_scales.reshape(sh)
            amax = np.max(np.abs(w), axis=tuple(
                i for i in range(w.ndim) if i != w.ndim - 1), keepdims=True)
            s = 127.0 / np.maximum(amax, 1e-8)
            q = np.clip(np.round(w * s), -127, 127).astype(np.int8)
            return jnp.asarray(q), jnp.asarray((1.0 / s).reshape(-1))

        qp = dict(qp)
        s_in = s0  # stage-1 (final up conv) input quant scales
        if amax_mid is not None:
            # x4 chain: stage 0 quantizes with the trunk scales; the mid
            # stream's own per-channel scales feed stage 1. In
            # "tail8:s1" mode stage 0 stays bf16 (up0_w_x) — only the
            # mid scales are folded.
            sm = 127.0 / np.maximum(np.asarray(amax_mid, np.float32), 1e-6)
            if not self.s1_only:
                qp["up0_w_q"], qp["up0_w_ws"] = q_oc(
                    self._tail_masters["up0_pair"], np.tile(s0, 2), 2)
                qp["up0_b_c"] = jnp.tile(qp["up0_b"], 8).astype(jnp.float32)
            qp["tail_sm"] = jnp.asarray(sm)
            s_in = sm
        if self.up_exact:
            # exact-phase stage 1: one sliced kernel per output phase,
            # s_in folded into each input axis (unpacked C channels)
            for ph, (w_ph, _) in enumerate(
                    self._tail_masters["up_phases"]):
                qp[f"upx{ph}_w_q"], qp[f"upx{ph}_ws"] = q_oc(
                    w_ph, np.asarray(s_in, np.float32), 2)
            qp["upx_b_c"] = jnp.tile(qp["up_b_0"], 4).astype(jnp.float32)
            if self.up_groups:
                # grouped kernels are BUILT FROM the quantized per-phase
                # kernels (identical per-out-channel scales — structural
                # zero padding cannot change an abs-max), so the grouped
                # form's output is bit-identical to the exact-phase form
                for g, gr in enumerate(self.up_groups):
                    pa, pb = gr["phases"]
                    wa = np.asarray(qp[f"upx{pa}_w_q"])
                    wb = np.asarray(qp[f"upx{pb}_w_q"])
                    cqg = wa.shape[-1]
                    wg = np.zeros((gr["uy"], gr["ux"], wa.shape[2],
                                   2 * cqg), np.int8)
                    oa, ob = gr["offs"]
                    wg[:, oa:oa + wa.shape[1], :, :cqg] = wa
                    wg[:, ob:ob + wb.shape[1], :, cqg:] = wb
                    qp[f"upg{g}_w_q"] = jnp.asarray(wg)
                    qp[f"upg{g}_ws"] = jnp.concatenate(
                        [qp[f"upx{pa}_ws"], qp[f"upx{pb}_ws"]])
            if self.up_pallas:
                # tap-list weights for the one-pass Pallas form: one
                # [C,C'] int8 matrix per true tap, order = up_tap_meta
                mats = []
                for ph, (w_ph, _) in enumerate(
                        self._tail_masters["up_phases"]):
                    wq = np.asarray(qp[f"upx{ph}_w_q"])
                    for dy in range(w_ph.shape[0]):
                        for dx in range(w_ph.shape[1]):
                            mats.append(wq[dy, dx])
                qp["upx_taps_w"] = jnp.asarray(np.stack(mats))
                qp["upx_ws4"] = jnp.stack(
                    [qp[f"upx{ph}_ws"] for ph in range(4)])
        elif self.up_fused and self.head_quant:
            # unpacked [3, KW*C, 4C'] matrix: contraction lanes (dx, c)
            kw = self._tail_masters["up_unpacked"].shape[1] // self.filters
            qp["up_w_q"], qp["up_w_ws"] = q_oc(
                self._tail_masters["up_unpacked"], np.tile(s_in, kw), 1)
        else:
            # pair conv kernel [ny,nx,2C,4C']: input channels (cx, c)
            qp["up_w_q"], qp["up_w_ws"] = q_oc(
                self._tail_masters["up_pair"], np.tile(s_in, 2), 2)
        if self.head_quant:
            # head input channels are W-pair slots (cx*4C'+u): s1 tiled 2
            qp["final_w_q"], qp["final_w_ws"] = q_oc(
                self._tail_masters["head"], np.tile(s1, 2), 2)
            if self.up_exact:
                c_up = s1.shape[0] // 4
                wq_np = np.asarray(qp["final_w_q"])
                for ph in range(4):
                    idx = head_conv.head_lane_slice(c_up, ph)
                    qp[f"final_w_q_ph{ph}"] = jnp.asarray(
                        wq_np[:, :, idx, :])
                if self.up_groups:
                    for g, gr in enumerate(self.up_groups):
                        idx = head_conv.head_group_lane_slice(
                            c_up, *gr["phases"])
                        qp[f"final_w_q_g{g}"] = jnp.asarray(
                            wq_np[:, :, idx, :])
        qp["tail_s0"] = jnp.asarray(s0)
        qp["tail_s1"] = jnp.asarray(s1)
        if zp1 is not None:
            qp["tail_zp1"] = jnp.asarray(zp1)
        # stage biases as full vectors (calibrate() then subtracts the
        # measured per-channel quantization bias from these)
        r_up = 4 if (self.up_fused and self.head_quant) else 8
        qp["up_b_c"] = jnp.tile(qp["up_b_0"], r_up).astype(jnp.float32)
        qp["final_b_c"] = jnp.tile(qp["final_b"], 32).astype(jnp.float32)
        return qp

    # ------------------------------------------------------------- apply
    def apply_stem(self, qp: Dict[str, Any], x: jax.Array) -> jax.Array:
        n, h, w, _ = x.shape
        if self.stem_plan is not None and "stem_w_b" in qp:
            # blocked stem (see __init__): s^2 pixels folded into lanes
            yb = sp.conv_same_phase_blocked_packed(
                x.astype(self.dtype), qp["stem_w_b"], self.stem_plan,
                qp["stem_b"])
            y = sp.depth_to_space(yb, self.stem_block)
        else:
            y = vops.same_conv(x.astype(self.dtype), qp["stem_w"],
                               qp["stem_b"])
        y = vops.prelu(y, qp["stem_alpha"])
        return y.reshape(n, h, w // self.pack, self.cp)  # packed

    def apply_trunk(self, qp: Dict[str, Any], h0: jax.Array,
                    collect_amax: bool = False):
        """Packed stem output -> packed trunk output (fused kernels).

        ``collect_amax``: additionally return per-layer per-lane abs-max
        of every quantized conv input (the z streams) — the calibration
        observables for per-channel trunk quantization."""
        n, h, wp_, cp = h0.shape
        pack = self.pack
        hw = h * wp_ * pack
        amaxes: Dict[str, jax.Array] = {}

        def amax_of(z):
            return jnp.max(jnp.abs(z.astype(jnp.float32)), axis=(0, 1, 2))

        if self._tag_quant("w_pre_0"):
            # dynamic per-tensor scale for the (un-normalized) stem output
            sx = jnp.maximum(jnp.max(jnp.abs(h0.astype(jnp.float32))), 1e-8)
            s_row = jnp.broadcast_to((127.0 / sx) / RES_QSCALE, (n, cp))
            a, st = fc.fused_conv_stats(
                h0, qp["w_pre_0"], pads=self.pads["w_pre_0"],
                pre="affine_act", act="none", scale=s_row,
                shift=jnp.zeros((n, cp), jnp.float32),
                quant=True, qscale=RES_QSCALE, stats_mode=self.stats_mode)
        else:
            a, st = fc.fused_conv_stats(h0, qp["w_pre_0"],
                                        pads=self.pads["w_pre_0"],
                                        stats_mode=self.stats_mode)

        hs = h0  # residual stream (bf16, packed)
        for i in range(self.res_block_num):
            s1, t1 = fc.stats_to_scale_shift(st, qp[f"g1_{i}"],
                                             qp[f"b1_{i}"], pack, hw)
            if collect_amax:
                z = (a.astype(jnp.float32) * s1[:, None, None, :]
                     + t1[:, None, None, :])
                z = jnp.where(z < 0, qp[f"alpha_{i}"] * z, z)
                amaxes[f"qs_a_{i}"] = amax_of(z)
            q_post = self._tag_quant(f"w_post_{i}")
            b_raw, st2 = fc.fused_conv_stats(
                a, qp[f"w_post_{i}"], pads=self.pads[f"w_post_{i}"],
                pre="affine_act", act="prelu", scale=s1, shift=t1,
                alpha=qp[f"alpha_{i}"], quant=q_post,
                qscale=qp[f"qs_a_{i}"] if q_post else QSCALE,
                stats_mode=self.stats_mode)
            s2, t2 = fc.stats_to_scale_shift(st2, qp[f"g2_{i}"],
                                             qp[f"b2_{i}"], pack, hw)
            nxt = (f"w_pre_{i + 1}" if i + 1 < self.res_block_num
                   else "w_prefinal")
            if collect_amax:
                z = (b_raw.astype(jnp.float32) * s2[:, None, None, :]
                     + t2[:, None, None, :] + hs.astype(jnp.float32))
                amaxes[f"qs_r_{i}"] = amax_of(z)
            q_nxt = self._tag_quant(nxt)
            a, hs, st = fc.fused_conv_stats(
                b_raw, qp[nxt], pads=self.pads[nxt],
                pre="affine_res", scale=s2, shift=t2, res=hs,
                quant=q_nxt,
                qscale=qp[f"qs_r_{i}"] if q_nxt else RES_QSCALE,
                stats_mode=self.stats_mode)

        # prefinal norm apply + global skip (one fused pass)
        sp_, tp_ = fc.stats_to_scale_shift(st, qp["g_pf"], qp["b_pf"],
                                           pack, hw)
        out = _apply_res(a, h0, sp_, tp_)
        if collect_amax:
            return out, amaxes
        return out

    def _tail_bf16_xpack(self, qp: Dict[str, Any], y: jax.Array,
                         emit_u8: bool = False) -> jax.Array:
        """bf16 x-packed tail on the r=1 canonical stream."""
        if self.times == 2:  # x4 chain: stage-0 up conv at LR first
            y = self._up0_to_canonical(self._up_xpack(
                y, qp["up0_w_x"], qp["up0_b"], pads=self.up0_pads))
        if self.up_fused:
            # env-gated Pallas up-conv experiment (docs/PERF.md round 3)
            y1 = upc.up_conv_fused(
                y, qp["up_w_p"], None,
                jnp.tile(qp["up_b_0"], 4).astype(jnp.float32),
                self.up_px, quant=False)
            n, h, w_, cs = y1.shape
            y1 = y1.reshape(n, h, w_ // 2, 2 * cs)  # free W-pair pack
        else:
            y1 = self._up_xpack(y, qp["up_w_x"], qp["up_b_0"])
        yp = head_conv.head_conv_s48(
            y1, qp["head_w_x"], None,
            jnp.tile(qp["final_b"], 32).astype(jnp.float32),
            self.final_px_q, emit_u8=emit_u8)
        return sp.depth_to_space_axes(yp, 4, 8)

    def _up_xpack(self, y: jax.Array, wk: jax.Array, b,
                  pads=None) -> jax.Array:
        """x-packed transpose conv + LeakyReLU on the r=1 canonical
        stream: [N,H,W,C] -> [N,H,W/2,8C'] (dtype follows the inputs)."""
        n, h, w_, c = y.shape
        y = y.reshape(n, h, w_ // 2, 2 * c)  # free W-pair pack
        y1 = lax.conv_general_dilated(y, wk, (1, 1),
                                      pads or self.up_pads_q,
                                      dimension_numbers=sp.CONV_DIMS)
        y1 = y1 + jnp.tile(b, 8).astype(y1.dtype)
        return vops.leaky_relu(y1, 0.2)

    @staticmethod
    def _up0_to_canonical(y1: jax.Array) -> jax.Array:
        """Stage-0 x-packed up-conv output [N,H,Wp,8C'] — lane order
        (u', py, px, c), i.e. output W-pair slot major then phase-major
        (rearrange_same_kernel_axes docstring) — to the canonical
        [N,2H,2W,C'] 2x stream: rows (y,py), cols (w~,u',px). Lowers to
        a layout copy + a 7-d transpose (~1.0 ms/f at x4, profiler
        decomposition docs/PERF.md round 3); a py-major lane
        permutation that makes this a single row-interleave measured
        SLOWER end-to-end (58.03 -> 54.2 fps) — XLA's layout assignment
        handles this form better. Keep it."""
        n, h, wp2, cs = y1.shape
        c = cs // 8
        x = y1.reshape(n, h, wp2, 2, 2, 2, c)
        x = x.transpose(0, 1, 4, 2, 3, 5, 6)  # n, h, py, w~, u', px, c
        return x.reshape(n, 2 * h, 4 * wp2, c)

    def apply_tail(self, qp: Dict[str, Any], trunk: jax.Array,
                   emit_u8: bool = False) -> jax.Array:
        """Packed trunk output -> HR image (prepacked phase tail).

        ``emit_u8``: emit codec uint8 frames straight from the head conv
        epilogue (x-packed tails fold it into the conv; others convert
        after) — the streaming clip path's output format."""
        n, h, wp_, cp = trunk.shape
        y = trunk.reshape(n, h, wp_ * self.pack, self.filters
                          ).astype(self.dtype)  # unpack to canonical r=1
        if self.tail_quant_ready and "tail_s0" in qp:
            # structural tail selection: calibrate() is the only source
            # of a qp containing tail_s0, and jit caches are keyed on
            # the pytree structure — so a jitted apply traced before
            # calibration retraces on the calibrated qp, and a stale
            # un-calibrated qp keeps the bf16 tail instead of running
            # int8 with a zero scale.
            return self._tail_int8(qp, y, emit_u8=emit_u8)
        if self.xpack_ready:
            return self._tail_bf16_xpack(qp, y, emit_u8=emit_u8)
        if emit_u8:
            from video_cycle_gan_upscaling_tpu.ops.codec import unit_to_uint8

            return unit_to_uint8(self.apply_tail(qp, trunk))
        if self.block0 > 1:
            y = sp.space_to_depth(y, self.block0)
        r = self.block0
        for i in range(self.times):
            y = sp.transpose_conv_phase_packed(y, qp[f"up_w_{i}"],
                                               self.up_plans[i],
                                               qp[f"up_b_{i}"])
            y = vops.leaky_relu(y, 0.2)
            r *= 2
        if self.final_mode == "asym":
            from jax import lax

            n2, gh, gw, cs = y.shape
            y2 = y.reshape(n2, gh, gw // 2, 2 * cs)  # free W-pair merge
            yp = lax.conv_general_dilated(
                y2, qp["final_w"].astype(y2.dtype), (1, 1), self.final_pads,
                dimension_numbers=sp.CONV_DIMS)
            yp = yp + jnp.tile(qp["final_b"], 2 * r * r).astype(yp.dtype)
            yp = jnp.tanh(yp.astype(jnp.float32))
            return sp.depth_to_space_axes(yp, r, 2 * r)
        yp = sp.conv_same_phase_blocked_packed(y, qp["final_w"],
                                               self.final_plan,
                                               qp["final_b"])
        yp = jnp.tanh(yp.astype(jnp.float32))
        return sp.depth_to_space(yp, r * self.extra)

    def _tail_int8(self, qp: Dict[str, Any], y: jax.Array,
                   emit_u8: bool = False) -> jax.Array:
        """W8A8 tail (calibrated), x-packed structure (see __init__): the
        transpose conv runs on W-pair-packed input at full K lanes, the
        big phase intermediate is stored int8 (half HBM traffic), and the
        head conv runs in the stride-(2,2) S=(4,8) form straight on that
        layout (ops/head_conv.py: 96 of 128 output lanes, no relayouts).
        Scales: per-CHANNEL activation scales (tail_s0/tail_s1) were
        folded into the weights' input axes at calibration, and the
        per-out-channel weight scales ride through the positively-
        homogeneous LeakyReLU into the elementwise dequant — so
        channel-wise quantization costs no extra runtime ops."""
        s0, s1 = qp["tail_s0"], qp["tail_s1"]  # [C], [4*C_up]
        q0_ready = False
        if self.times == 2 and self.s1_only:
            # "tail8:s1": BF16 stage-0 on the unquantized trunk output
            # (the s0 int8 representation carries the whole trained-
            # weights tail deficit — round-5 margin probe); the mid
            # stream re-enters the int8 chain below via tail_sm, whose
            # amax was measured on exactly this bf16 stream
            y = self._up0_to_canonical(self._up_xpack(
                y.astype(self.dtype), qp["up0_w_x"], qp["up0_b"],
                pads=self.up0_pads))
            s0 = qp["tail_sm"]
        elif self.times == 2:
            # x4 chain stage 0: one fused Pallas pass (per-lane requant +
            # W8A8 pair conv + dequant + bias + LeakyReLU —
            # ops/pallas/pair_conv.py), unfold to the canonical 2x
            # stream. On the exact-phase stage-1 path the kernel ALSO
            # re-quantizes with the mid-stream scales (tail_sm) before
            # emitting, so the canonical transpose moves int8 (half the
            # HBM) and stage 1's separate requant pass disappears.
            # Measured (scripts/exact_up_ab.py): tail8 17.44 -> 16.15
            # ms/f, but the SAME int8 emit collapsed the hybrid graph
            # 20.18 -> 58.69 (XLA's int8 transpose layout goes
            # pathological there), so it keys on head_quant; the pair
            # and hybrid paths keep the bf16 emit they were calibrated
            # against.
            n0, h0_, w0_, c0_ = y.shape
            mid_scales = (jnp.tile(qp["tail_sm"], 8)
                          if self.up_exact and self.head_quant else None)
            y0 = pair_conv.pair_conv_fused(
                y.reshape(n0, h0_, w0_ // 2, 2 * c0_), qp["up0_w_q"],
                pads=self.up0_pads, w_scales=qp["up0_w_ws"],
                bias=qp["up0_b_c"], in_scales=jnp.tile(s0, 2),
                out_scales=mid_scales)
            y = self._up0_to_canonical(y0)
            s0 = qp["tail_sm"]
            q0_ready = mid_scales is not None
        if self.up_exact:
            # exact-phase stage 1 (VCGU_EXACT_UP=1): one conv per output
            # phase at its true tap support — 25C taps/HR-pixel vs the
            # pair form's 48C. The head is linear over lane groups, so
            # each phase part feeds its own head conv on its lane slice
            # of the head kernel and the int32/f32 accs sum — the
            # concatenated HR stream NEVER materializes (concat form
            # OOM'd HBM at the x4 hybrid flagship: +4 GB peak).
            q0 = y if q0_ready else jnp.clip(
                jnp.round(y.astype(jnp.float32) * s0), -127, 127
            ).astype(jnp.int8)
            c_up4 = qp["upx_b_c"].shape[0]
            cq = c_up4 // 4
            parts = None
            if "upx_taps_w" in qp:
                # one-pass Pallas form (VCGU_PHASE_UP=1): all four
                # phases computed per row-block, input crosses HBM once
                parts = phase_up.phase_up_fused(
                    q0, qp["upx_taps_w"], self.up_tap_meta,
                    qp["upx_ws4"], qp["upx_b_c"].reshape(4, cq),
                    s1.reshape(4, cq) if self.head_quant else None,
                    out_dtype=self.dtype)
            if (self.up_groups and parts is None
                    and _os.environ.get("VCGU_PAIR_PHASE", "0") != "1"):
                # grouped stage-1 (VCGU_GROUP_UP=1): two union-window
                # convs instead of four per-phase ones — bit-identical
                # output (the grouped kernels are slices of the same
                # quantized per-phase kernels, __init__/_refold_tail)

                def _sl(v, pa, pb):
                    return jnp.concatenate(
                        [v[pa * cq:(pa + 1) * cq],
                         v[pb * cq:(pb + 1) * cq]])

                acc_h = None
                for g, gr in enumerate(self.up_groups):
                    pa, pb = gr["phases"]
                    acc = lax.conv_general_dilated(
                        q0, qp[f"upg{g}_w_q"], (1, 1), gr["pads"],
                        dimension_numbers=sp.CONV_DIMS,
                        preferred_element_type=jnp.int32)
                    z = (acc.astype(jnp.float32) * qp[f"upg{g}_ws"]
                         + _sl(qp["upx_b_c"], pa, pb))
                    z = vops.leaky_relu(z, 0.2)
                    if self.head_quant:
                        zq = z * _sl(s1, pa, pb)
                        if "tail_zp1" in qp:  # asymmetric emit
                            zq = zq - _sl(qp["tail_zp1"], pa, pb)
                        z = jnp.clip(jnp.round(zq), -127, 127
                                     ).astype(jnp.int8)
                    else:
                        z = z.astype(self.dtype)
                    w_g = (qp[f"final_w_q_g{g}"] if self.head_quant
                           else qp[f"head_w_x_g{g}"])
                    n, h, w_, cs = z.shape
                    zpk = z.reshape(n, h, w_ // 2, 2 * cs)
                    a = head_conv.head_conv_s48_acc(zpk, w_g,
                                                    self.final_px_q)
                    acc_h = a if acc_h is None else acc_h + a
                yp = acc_h.astype(jnp.float32)
                if self.head_quant:
                    yp = yp * qp["final_w_ws"]
                yp = head_conv.head_epilogue(
                    yp + qp.get("final_b_map", qp["final_b_c"]), emit_u8)
                return sp.depth_to_space_axes(yp, 4, 8)
            acc_h = None
            for ph in range(4):
                if parts is not None:
                    z = parts[ph]
                else:
                    # Per-phase conv + epilogue. The fused Pallas form
                    # (pair_conv_fused int8-in/int8-out) wins ISOLATED
                    # (5.35 vs 7.24 ms/f at the x4 flagship) but loses
                    # in-graph (apply_u8 16.58 -> 20.95 ms/f) — and the
                    # loss is NOT the head-side relayout: chaining the
                    # Pallas head after it (scripts/pallas_chain_ab.py)
                    # costs the same +4.4 ms/f, so the relayout sits at
                    # the kernel's own INPUT boundary (q0 arrives from
                    # the stage-0 emit in XLA's int8 conv layout).
                    # Env-gated VCGU_PAIR_PHASE=1 for experiments; the
                    # XLA chain is the default.
                    if _os.environ.get("VCGU_PAIR_PHASE", "0") == "1":
                        z = pair_conv.pair_conv_fused(
                            q0, qp[f"upx{ph}_w_q"],
                            pads=self.up_phase_pads[ph],
                            w_scales=qp[f"upx{ph}_ws"],
                            bias=qp["upx_b_c"][ph * cq:(ph + 1) * cq],
                            out_scales=(s1[ph * cq:(ph + 1) * cq]
                                        if self.head_quant else None),
                            out_zp=(qp["tail_zp1"][ph * cq:(ph + 1) * cq]
                                    if self.head_quant
                                    and "tail_zp1" in qp else None))
                        if not self.head_quant:
                            z = z.astype(self.dtype)
                    else:
                        acc = lax.conv_general_dilated(
                            q0, qp[f"upx{ph}_w_q"], (1, 1),
                            self.up_phase_pads[ph],
                            dimension_numbers=sp.CONV_DIMS,
                            preferred_element_type=jnp.int32)
                        z = (acc.astype(jnp.float32) * qp[f"upx{ph}_ws"]
                             + qp["upx_b_c"][ph * cq:(ph + 1) * cq])
                        z = vops.leaky_relu(z, 0.2)
                        if self.head_quant:
                            zq = z * s1[ph * cq:(ph + 1) * cq]
                            if "tail_zp1" in qp:  # asymmetric emit
                                zq = zq - qp["tail_zp1"][
                                    ph * cq:(ph + 1) * cq]
                            z = jnp.clip(jnp.round(zq), -127, 127
                                         ).astype(jnp.int8)
                        else:
                            z = z.astype(self.dtype)
                w_ph = (qp[f"final_w_q_ph{ph}"] if self.head_quant
                        else qp[f"head_w_x_ph{ph}"])
                n, h, w_, cs = z.shape
                zp = z.reshape(n, h, w_ // 2, 2 * cs)  # free W-pair pack
                a = head_conv.head_conv_s48_acc(zp, w_ph, self.final_px_q)
                acc_h = a if acc_h is None else acc_h + a
            yp = acc_h.astype(jnp.float32)
            if self.head_quant:
                yp = yp * qp["final_w_ws"]
            yp = head_conv.head_epilogue(
                yp + qp.get("final_b_map", qp["final_b_c"]), emit_u8)
            return sp.depth_to_space_axes(yp, 4, 8)
        elif self.up_fused and self.head_quant:
            # env-gated experiment: fused Pallas up conv on the UNPACKED
            # phase kernel. s1 folds through the positively-homogeneous
            # LeakyReLU.
            q0 = jnp.clip(jnp.round(y.astype(jnp.float32) * s0), -127, 127
                          ).astype(jnp.int8)
            s1q = jnp.tile(s1, 1)
            q1 = upc.up_conv_fused(
                q0, qp["up_w_q"], qp["up_w_ws"] * s1q,
                qp["up_b_c"] * s1q, self.up_px, quant=True)
            n, h, w_, cs = q1.shape
            q1 = q1.reshape(n, h, w_ // 2, 2 * cs)  # free W-pair pack
        else:
            # stage-1 up conv, one fused Pallas pass: requant + W8A8
            # pair conv + dequant + bias + LeakyReLU (+ requant for the
            # all-int8 tail). The XLA formulation left ~3/4 of the int8
            # roofline on HBM round trips of the int32 accumulator and
            # the dequantized activation (scripts/microbench_r3g.py).
            n, h, w_, c = y.shape
            yp_in = y.reshape(n, h, w_ // 2, 2 * c)  # free W-pair pack
            y1 = pair_conv.pair_conv_fused(
                yp_in, qp["up_w_q"], pads=self.up_pads_q,
                w_scales=qp["up_w_ws"], bias=qp["up_b_c"],
                in_scales=jnp.tile(s0, 2),
                out_scales=jnp.tile(s1, 2) if self.head_quant else None,
                out_zp=(jnp.tile(qp["tail_zp1"], 2)
                        if self.head_quant and "tail_zp1" in qp
                        else None))
            if not self.head_quant:
                # hybrid (budget) tail: bf16 head on the dequantized
                # up-conv output — drops the head's input-requant and
                # weight-rounding error stages (~65% of the all-int8
                # tail MSE, scripts/quant_decomp.py)
                yp = head_conv.head_conv_s48(
                    y1.astype(self.dtype), qp["head_w_x"], None,
                    qp["final_b_c"], self.final_px_q, emit_u8=emit_u8)
                return sp.depth_to_space_axes(yp, 4, 8)
            q1 = y1
        yp = head_conv.head_conv_s48(
            q1, qp["final_w_q"], qp["final_w_ws"],
            qp.get("final_b_map", qp["final_b_c"]),
            self.final_px_q, emit_u8=emit_u8)
        return sp.depth_to_space_axes(yp, 4, 8)

    def apply(self, qp: Dict[str, Any], x: jax.Array) -> jax.Array:
        """[N,H,W,3] in [-1,1] -> [N,H*f,W*f,3]; jit me."""
        return self.apply_tail(qp, self.apply_trunk(qp, self.apply_stem(qp, x)))

    def apply_u8(self, qp: Dict[str, Any], x: jax.Array) -> jax.Array:
        """[N,H,W,3] in [-1,1] -> codec uint8 [N,H*f,W*f,3]: the emit is
        folded into the head-conv epilogue so no f32 HR tensor exists
        (4x less HBM on every post-head pass) — the clip path's mode."""
        return self.apply_tail(qp, self.apply_trunk(qp, self.apply_stem(qp, x)),
                               emit_u8=True)

    def __call__(self, qp, x):
        return self.apply(qp, x)


def _apply_res(x, res, scale, shift):
    """y = x*scale + shift + res on packed tensors (Pallas on TPU)."""
    use_pallas = fc._HAVE_PALLAS and (pnorms._on_tpu() or pnorms.INTERPRET)
    if use_pallas:
        return pnorms._apply_res_pallas(x, res, scale, shift)
    return (x.astype(jnp.float32) * scale[:, None, None, :]
            + shift[:, None, None, :]
            + res.astype(jnp.float32)).astype(x.dtype)


def make_fast_orig(params, cfg_model, upscale_factor: int,
                   tile_hw: Tuple[int, int], quant: bool = False,
                   dtype=jnp.bfloat16):
    """(apply_fn, qp) pair for the tiled-inference harness; falls back to
    None when the fused path doesn't support the config (caller keeps the
    modular path)."""
    h, w = tile_hw
    ok = (cfg_model.norm == "instance" and h % 2 == 0 and w % 2 == 0)
    if not ok:
        return None
    runner = FastOrigRunner(
        params, res_block_num=cfg_model.res_block_num,
        upscale_factor=upscale_factor, tile_hw=tile_hw,
        filters=cfg_model.filters, quant=quant, dtype=dtype)
    return runner
