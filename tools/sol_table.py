#!/usr/bin/env python3
"""Analytic speed-of-light decomposition of the guided train step.

Per layer-group of the 2-tower ResNet-18 + MMTM model (models/resnet.py,
models/mmtm.py; shapes = reference model.py:53-60 at 224x224), computes:

  * fwd+bwd FLOPs (MACs x 2; bwd = dX + dW convs = 2x fwd, except conv1
    whose input gradient is never needed -> 1x fwd extra),
  * minimum HBM traffic in bf16 (read inputs + weights + write outputs;
    bwd modeled as 2x fwd traffic: re-read saved activation + grad flows),
  * an MXU tiling-efficiency estimate for the systolic array:
    contraction dim K = Cin*k*k and output dim N = Cout are padded to the
    128-lane MXU, so eff = (K/ceil128(K)) * (N/ceil128(N)).  This is an
    *estimate* of the unavoidable lane waste for small channel counts --
    XLA's actual conv lowering may tile differently.

Speed-of-light time per stage = max(FLOPs/(peak*eff), bytes/HBM_BW); the
table reports both terms so compute- vs bandwidth-bound stages are
explicit.  v5e: 197 TFLOP/s bf16 peak, 819 GB/s HBM.

Usage: python3 tools/sol_table.py [--batch 256]
"""

import argparse

PEAK = 197e12  # v5e bf16 FLOP/s
HBM = 819e9  # v5e HBM bytes/s
BYTES = 2  # bf16


def ceil128(x):
    return ((x + 127) // 128) * 128


def conv(name, hw_in, cin, cout, k, stride, n, bwd_dx=True):
    """One conv applied n times (towers x repeats). Returns stage dict."""
    hw_out = hw_in // stride
    macs = hw_out * hw_out * cout * cin * k * k  # per sample per apply
    fwd_flops = 2 * macs
    # bwd: dW conv (= fwd MACs) always; dX conv (= fwd MACs) unless first layer
    bwd_flops = fwd_flops * (2 if bwd_dx else 1)
    in_bytes = hw_in * hw_in * cin * BYTES
    out_bytes = hw_out * hw_out * cout * BYTES
    w_bytes = cout * cin * k * k * BYTES
    keff = cin * k * k
    eff = (keff / ceil128(keff)) * (cout / ceil128(cout))
    return dict(
        name=name,
        n=n,
        fwd_flops=fwd_flops,
        tot_flops=fwd_flops + bwd_flops,
        # per-sample activation traffic (fwd + ~2x for bwd: saved-activation
        # re-read + grad flows); weights move once per conv apply, not per
        # sample (read fwd, read for dX, write dW)
        tot_traffic=3 * (in_bytes + out_bytes),
        w_traffic=3 * w_bytes,
        eff=eff,
    )


def elementwise(name, hw, c, n, passes):
    """Bandwidth-only stage (pool / MMTM gating scale): `passes` full
    read+write sweeps of a (hw, hw, c) map, fwd+bwd combined."""
    t = passes * 2 * hw * hw * c * BYTES
    return dict(name=name, n=n, fwd_flops=0, tot_flops=0, tot_traffic=t, w_traffic=0, eff=1.0)


def model_stages():
    s = []
    s.append(conv("conv1 7x7 s2 (stem)", 224, 3, 64, 7, 2, n=2, bwd_dx=False))
    s.append(elementwise("maxpool 3x3 s2", 112, 64, n=2, passes=2))
    s.append(conv("layer1 3x3 64ch @56^2", 56, 64, 64, 3, 1, n=2 * 4))
    s.append(conv("layer2.0 3x3 64->128 s2", 56, 64, 128, 3, 2, n=2))
    s.append(conv("layer2 3x3 128ch @28^2", 28, 128, 128, 3, 1, n=2 * 3))
    s.append(conv("layer2 ds 1x1 s2", 56, 64, 128, 1, 2, n=2))
    s.append(conv("layer3.0 3x3 128->256 s2", 28, 128, 256, 3, 2, n=2))
    s.append(conv("layer3 3x3 256ch @14^2", 14, 256, 256, 3, 1, n=2 * 3))
    s.append(conv("layer3 ds 1x1 s2", 28, 128, 256, 1, 2, n=2))
    s.append(conv("layer4.0 3x3 256->512 s2", 14, 256, 512, 3, 2, n=2))
    s.append(conv("layer4 3x3 512ch @7^2", 7, 512, 512, 3, 1, n=2 * 3))
    s.append(conv("layer4 ds 1x1 s2", 14, 256, 512, 1, 2, n=2))
    # MMTM gating at 28^2/128, 14^2/256, 7^2/512: squeeze read + scale
    # read-modify-write of both towers' maps, fwd + bwd (~2 sweeps each).
    for hw, c in ((28, 128), (14, 256), (7, 512)):
        s.append(elementwise(f"mmtm gating @{hw}^2/{c}ch", hw, c, n=2, passes=4))
    return s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--measured-ms", type=float, default=None, help="measured step time to compare")
    args = ap.parse_args()
    B = args.batch

    rows, tot_ideal, tot_eff, tot_bw, tot_flops = [], 0.0, 0.0, 0.0, 0.0
    for st in model_stages():
        flops = B * st["n"] * st["tot_flops"]
        traffic = st["n"] * (B * st["tot_traffic"] + st["w_traffic"])
        t_ideal = flops / PEAK
        t_eff = flops / (PEAK * st["eff"]) if flops else 0.0
        t_bw = traffic / HBM
        sol = max(t_eff, t_bw)
        bound = "MXU" if t_eff >= t_bw else "HBM"
        rows.append((st["name"], st["n"], flops / 1e9, st["eff"], t_eff * 1e3, t_bw * 1e3, sol * 1e3, bound))
        tot_flops += flops
        tot_ideal += t_ideal
        tot_eff += max(t_eff, t_bw)
        tot_bw += t_bw

    print(f"batch {B}, v5e bf16 peak {PEAK/1e12:.0f} TFLOP/s, HBM {HBM/1e9:.0f} GB/s\n")
    print("| stage (x count) | GFLOP | MXU eff | t_MXU ms | t_HBM ms | SoL ms | bound |")
    print("|---|---:|---:|---:|---:|---:|---|")
    for name, n, gf, eff, te, tb, sol, bound in rows:
        print(f"| {name} x{n} | {gf:.0f} | {eff:.2f} | {te:.2f} | {tb:.2f} | {sol:.2f} | {bound} |")
    print(
        f"\ntotal model FLOPs: {tot_flops/1e9:.0f} GFLOP "
        f"({tot_flops/B/1e9:.1f} GFLOP/sample)"
    )
    print(f"ideal (100% MXU, no tiling waste):   {tot_ideal*1e3:.1f} ms")
    print(f"speed-of-light (tiling + bandwidth): {tot_eff*1e3:.1f} ms")
    if args.measured_ms:
        print(
            f"measured step: {args.measured_ms:.1f} ms -> "
            f"{tot_ideal*1e3/args.measured_ms*100:.0f}% of ideal peak (MFU), "
            f"{tot_eff*1e3/args.measured_ms*100:.0f}% of tiling/bandwidth-adjusted SoL"
        )


if __name__ == "__main__":
    main()
