"""Pallas TPU kernels — currently empty by measurement, not neglect.

Two generations of hand-written kernels for the UNet serving path lived
here and were removed after losing to the XLA path they targeted. The
post-mortems matter more than the code; both are preserved in git history.

1. **im2col conv3x3** (round 1, removed at commit 6ee82c2): exact fused
   conv+bias+LeakyReLU; stayed grid/VMEM-liveness-bound at ~12 ms per
   frame-equivalent vs XLA's ~2 ms. Lesson: don't fight XLA at a single
   dense conv — change the representation instead (that insight became
   models/unet_s2d.py, the production fast path).

2. **s2d_chain fused head/tail** (round 2, removed at this commit): the
   UNet's level-1 encoder head (conv1_1+conv1_2+group_max) and decoder tail
   (upv9+conv9_1+conv9_2+1x1-head) as single Pallas kernels in the exact
   2x2-block s2d form — 1.78x structural FLOPs instead of the dense-3x3
   form's 4x, per-group selection as lane-preserving masked adds in VMEM,
   group_max via MXU permutation matmuls, upv9 folded into conv9_1's block
   kernel through an appended ones-channel. Exact (interpret-mode tested)
   and heavily tuned (row-chunked f32 accumulators, bf16 scratch,
   store-realigned windows). Measured on v5e at the only compilable tile
   (th=32, tw=136; all larger tiles exhaust VMEM — scoped-vmem accounting
   is ~5-10x pessimistic): tail 10.4 ms vs the folded XLA tail's ~6.7 ms
   composed marginal; head 7.5 ms vs XLA's ~6.5 ms. A shift/select/chunk
   ablation of the tail kernel (2026-08-17) showed the suspected overheads
   were noise: no-column-shifts 10.34 ms, no-shifts-at-all 10.10 ms,
   no-group-select 10.19 ms, chunk=64 11.08 ms — i.e. the kernel sat at its
   MAC/issue-bound structural floor (~30 TFLOP/s effective) with <3%
   recoverable. XLA runs the dense-s2d form at ~77 TFLOP/s dense-rate
   composed, so its 4x structural zeros cost less than Pallas's issue
   overheads on this shape class.

   What DID win instead (models/unet_s2d.py): folding upv9's s2d 1x1 into
   conv9_1's kernel at transform time (-2.3 ms) and lane-slice group_max
   (-1.4 ms) — XLA-level rewrites that shed glue and structural-zero work
   rather than re-scheduling the MACs.

3. **Winograd F(2x2,3x3) tail/head** (round 3, removed at this commit):
   the four [3,3,~128,128] dense-s2d convs as F(2x2,3x3) — 2.25x fewer
   multiplies as [532,128]@[128,128] MXU matmuls, with the stride-2 tiling
   made stride-free by pre-splitting the padded input into even/odd column
   planes (no lane slices, no strided access in-kernel; the whole decoder
   tail chained in parity-split space). Exact (interpret-mode parity incl.
   the full packed forward). Measured on v5e (2026-08-17): serving A/B
   hybrid 21.09 ms/frame vs wino 30.08; diagnosis isolated the loss — the
   bare kernel only TIES the XLA direct conv (5.06 vs 5.44 ms isolated;
   the 2.25x multiply cut is eaten by VPU transform/issue overhead at the
   [532,128] tile shape), while the mandatory XLA parity-split glue costs
   a full conv per round trip (pad_split+interleave: 4.89 ms — on this
   machine ANY stride-2/transpose relayout of a full-frame tensor costs
   5-10 ms, see the round-3 layout study in STATUS.md). Code in git
   history (commit b900371); the shared _fold_conv91 refactor survives.

4. **Alternating-alignment 2x2 s2d convs** (round 3, XLA-level, never
   merged): a genuinely new representation for the dense-s2d layers — a
   conv from standard-aligned s2d groups to HALF-PIXEL-SHIFTED groups
   needs only a [2,2,4C,4D] kernel at 9/16 density (1.78x FLOPs, vs the
   dense-3x3 form's 4x), the reverse direction likewise, and consecutive
   conv PAIRS (conv1_1/conv1_2, conv9_1/conv9_2) cancel the shift — so
   the layout change is purely semantic: no slicing, no relayout, plain
   stride-1 NHWC convs end to end (the flaw that killed generations 1-3).
   Measured on v5e (2026-08-17, chained-pair harness): XLA runs 2x2
   kernels at HALF the 3x3 rate (27.6 vs 52.9 TF/s in-harness; the conv
   emitter is tuned for odd kernels, consistent with the round-2 [2,3]-tap
   finding), erasing the 2.25x multiply cut — 7.2 vs 8.4 ms/pair — and
   the mandatory shifted-border zero-masks cost +2.4 ms/pair in every
   form tried (dynamic-update-slice, fused iota-select, shifted-einsum
   decomposition). Net: a loss. Not merged; the derivation is recorded
   here because the representation is correct and would win on a conv
   emitter that handles even kernels at parity.

5. **Serving-loop floor study** (round 3, measurement only): the last
   uncharacterized slice of the 21.1 ms frame. An identity body inside the
   bench's lax.map loop (f32 read -> bf16 cast -> f32 write, 48 MB r+w)
   costs 1.54-1.59 ms/frame REGARDLESS of storage layout — packed
   [712,1064,16] (16/128 lanes) and flat [712,17024] (dense lanes) measure
   identical, so the floor is loop structure + dispatch, not lane tiling,
   and feeding byte-identical flat frames moves nothing (21.05 vs 21.07
   prod A/B). Amortizing the floor by batching 2/3/4 frames per map
   iteration is slightly WORSE (21.5/23.0/22.2 ms/frame — conv efficiency
   at batch>1 loses more than the floor returns). Head sub-profile in the
   same harness: conv1_2 runs at ~184 TF/s (peak); conv1_1 (+1.0 ms,
   [3,3,16,128]) and group_max (+1.05 ms) are the only sub-peak stages,
   bounded by the narrow-Cin input read that any first layer must pay.
   Ceiling arithmetic: 21.1 = ~19.5 ms compute at XLA's measured dense
   rates + ~1.5 ms loop floor; no remaining addressable component >1 ms.

6. **int8 band-by-band roofline close-out** (round 5, measurement only —
   tools/int8_roofline.py, v5e, 712x1064 packed, composed prefix marginals
   vs per-shape isolated MXU rates from tools/bench_int8.py):

   | band | TFLOP | measured ms | at-isolated-rates ms | verdict |
   |---|---:|---:|---:|---|
   | head | 0.251 | 5.10 | 5.00 | closed (conv1_1 at its narrow-Cin floor) |
   | c2 | 0.084 | 1.85 | 1.86 | closed |
   | c3 | 0.084 | 0.74 | 1.24 | closed, 1.7x BETTER composed |
   | c4+c5 | 0.168 | 0.82 | 1.86 | closed, 2.3x better |
   | c6+c7 | 0.360 | 1.62 | 6.49 | closed, 4.0x better |
   | c8 | 0.180 | 3.54 | 5.10 | closed |
   | tail | 0.561 | 5.18 | 6.31 | closed |

   Every serving band's composed marginal meets or beats what the band
   would cost at each op's ISOLATED measured rate (the deep bands run
   2-4x faster composed — XLA overlaps their small grids with neighbors).
   The two r4 "unattacked" bands resolve as: head — the bf16 conv1_1 is
   AT the narrow-GEMM floor and s8 16->128 measured 0.72x SLOWER than
   bf16 (bench_int8, lane-padded input), so there is no lower-precision
   rate to harvest; c8/tail — already at/above their own isolated s8
   rates. An int4 probe (s4xs4->s32 conv on the dominant 128-ch shape)
   fails to lower: "UNIMPLEMENTED: TPU backend error" — no int4 MXU path
   exists on this backend/toolchain. 686 Mpix/s int8 is the machine's
   number for this architecture; moving it requires different MATH
   (fewer/denser MACs), not a better schedule or narrower dtype.

Net lesson for this workload: with both GEMM dims 128-aligned (the whole
point of the s2d representation), XLA's conv scheduling is already at the
machine's effective roofline; hand kernels pay off only when they change
the MEMORY TRAFFIC, not the MAC schedule — ssim.py (this package) wins
exactly that way: a reduction kernel that replaces ~15 relayout-prone
full-frame passes with a read-once tiled reduction. The host-side C++
packer (native/rawproc.cpp) and the packed-layout pipeline remain the
other non-compiler wins.
"""
