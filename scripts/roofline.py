#!/usr/bin/env python
"""Analytic conv-FLOP roofline for the mutual step (VERDICT r1 Next #1).

Computes the MXU FLOPs of every conv in one mutual iteration at the bench
shapes and divides by the chip's practical bf16 conv throughput to get the
hard ceiling on images/sec/chip. Pure arithmetic — no JAX — so the argument is
auditable. The measured per-block TF/s comes from scripts/profile_step.py
xplane traces (DESIGN.md round-2 trace table).

Step composition (reference accounting, pt/engine/trainer.py:263-392):
  teacher forward            : B images, no grad
  student fused pass forward : 2B sup views + B unsup = 3B images
  student backward           : dgrad+wgrad ~ 2x forward, blocks 1-2 excluded
                               (frozen stem, stop_gradient at FREEZE_AT=2)
"""

import argparse

VGG16 = [  # (block, [channels]); pool halves H,W after blocks 1-4
    (1, [64, 64]),
    (2, [128, 128]),
    (3, [256, 256, 256]),
    (4, [512, 512, 512]),
    (5, [512, 512, 512]),
]


def conv_flops_per_image(h, w, detail=False):
    """Returns (per-block fwd MXU FLOPs, final feature hw)."""
    flops = {}
    cin = 3
    for blk, chans in VGG16:
        f = 0
        for cout in chans:
            f += 2 * h * w * 9 * cin * cout
            cin = cout
        flops[blk] = f
        if blk < 5:
            h, w = h // 2, w // 2
    return flops, (h, w)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--canvas", default="608x1216")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--peak-tfs", type=float, default=197.0,
                   help="chip bf16 dense peak (v5e: 197 TF/s)")
    p.add_argument("--eff", default="0.35,0.72",
                   help="achieved fraction of peak for blocks 1-2, blocks 3-5 "
                        "(measured: 70 / ~190 TF/s xplane, batch-8 trace)")
    p.add_argument("--measured-step-ms", type=float, default=0.0)
    args = p.parse_args()

    h, w = (int(t) for t in args.canvas.split("x"))
    B = args.batch
    fb, (fh, fw) = conv_flops_per_image(h, w)
    e12, e35 = (float(t) for t in args.eff.split(","))

    # RPN head convs on the stride-16 map: 3x3x512x512 + two 1x1 heads (A*(1+8) ch)
    rpn = 2 * fh * fw * (9 * 512 * 512 + 512 * 15 * 9)

    fwd_images = 4 * B            # teacher B + student 3B
    bwd_images = 3 * B            # student only
    tf = 1e12
    t12 = sum(fb[b] for b in (1, 2)) / (args.peak_tfs * e12 * tf)
    t35 = (sum(fb[b] for b in (3, 4, 5)) + rpn) / (args.peak_tfs * e35 * tf)
    t_fwd = fwd_images * (t12 + t35)
    t_bwd = bwd_images * 2 * t35  # blocks 1-2 excluded (frozen stem)
    t_conv = t_fwd + t_bwd

    total_fwd_flops = fwd_images * (sum(fb.values()) + rpn)
    total_bwd_flops = bwd_images * 2 * (sum(fb[b] for b in (3, 4, 5)) + rpn)

    print(f"canvas {h}x{w}, batch {B}: conv FLOPs/iter = "
          f"{(total_fwd_flops + total_bwd_flops) / 1e12:.2f} TF "
          f"(fwd {total_fwd_flops / 1e12:.2f}, bwd {total_bwd_flops / 1e12:.2f})")
    print(f"blocks 1-2 @ {args.peak_tfs * e12:.0f} TF/s, "
          f"blocks 3-5+RPN @ {args.peak_tfs * e35:.0f} TF/s "
          f"-> conv-only time {t_conv * 1e3:.1f} ms/iter")
    ceil = 4 * B / t_conv
    print(f"conv-only ceiling: {ceil:.1f} img/s/chip "
          f"(vs 3x-V100 target 165; 100%-of-peak-everywhere ceiling "
          f"{4 * B / ((total_fwd_flops + total_bwd_flops) / (args.peak_tfs * tf)):.1f})")
    if args.measured_step_ms:
        ms = args.measured_step_ms
        print(f"measured step {ms:.0f} ms -> {4 * B / ms * 1e3:.1f} img/s/chip; "
              f"non-conv share {(ms - t_conv * 1e3) / ms * 100:.0f}%")


if __name__ == "__main__":
    main()
