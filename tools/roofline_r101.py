"""Analytic roofline for the server train step's ResNet-101 tower.

VERDICT r3 next-step #2 asks for the server step to reach >=90 TFLOP/s
effective *or* "a written arithmetic-intensity proof that 77 is the HBM
roofline". This script computes that proof's numbers: per-layer FLOPs
and minimum HBM traffic for R101 fwd+bwd at the bench geometry
(bs128 @ 224px, bf16 activations/weights, fp32 BN stats), prices each
layer at max(flops/peak, bytes/bw) on v5e (197 TFLOP/s bf16,
819 GB/s HBM), and prints the summed lower bound next to the measured
step so BENCH.md can cite a concrete floor instead of a hunch.

Traffic model (charitable to the hardware — real XLA does worse):
  * conv fwd:  read in + weights, write out (BN+ReLU fused as epilogue)
  * conv bwd_input:  read grad_out + weights, write grad_in
  * conv bwd_filter: read grad_out + saved in, write weight grads (fp32)
  * BN train adds one extra fwd read of the conv output (stats pass
    cannot always fuse with the producer at these spatial sizes) and
    one bwd read for the stat grads.
Everything is bf16 (2 B) except weight grads / BN stats (4 B).
"""

import argparse
import json

PEAK_TFLOPS = 197e12   # v5e bf16
HBM_BW = 819e9         # v5e bytes/s

# (name, in_ch, out_ch, k, stride, out_hw, repeats)
def r101_layers(img=224):
    layers = []
    hw = img // 2  # stem conv stride 2 -> 112
    layers.append(("stem", 3, 64, 7, 2, hw, 1))
    hw = hw // 2   # maxpool -> 56
    # Bottleneck stages: (blocks, width). R101 = 3,4,23,3.
    stages = [(3, 64, 1), (4, 128, 2), (23, 256, 2), (3, 512, 2)]
    in_ch = 64
    for blocks, width, stride in stages:
        out_hw = hw // stride
        # first block: stride + downsample projection
        layers.append((f"b{width}_proj", in_ch, width * 4, 1, stride,
                       out_hw, 1))
        layers.append((f"b{width}_c1a", in_ch, width, 1, 1, hw, 1))
        layers.append((f"b{width}_c2a", width, width, 3, stride,
                       out_hw, 1))
        layers.append((f"b{width}_c3a", width, width * 4, 1, 1,
                       out_hw, 1))
        # remaining blocks
        n = blocks - 1
        if n:
            layers.append((f"b{width}_c1", width * 4, width, 1, 1,
                           out_hw, n))
            layers.append((f"b{width}_c2", width, width, 3, 1,
                           out_hw, n))
            layers.append((f"b{width}_c3", width, width * 4, 1, 1,
                           out_hw, n))
        in_ch = width * 4
        hw = out_hw
    return layers


def analyze(batch=128, img=224):
    total_flops = total_bytes = total_time = 0.0
    rows = []
    for name, cin, cout, k, stride, ohw, reps in r101_layers(img):
        ihw = ohw * stride
        n_out = batch * ohw * ohw * cout          # output elements
        n_in = batch * ihw * ihw * cin
        w = k * k * cin * cout
        # fwd + bwd_input + bwd_filter: 3x the fwd MACs, 2 flops/MAC
        flops = 3 * 2 * n_out * k * k * cin * reps
        a = 2.0  # bf16 bytes
        fwd = n_in * a + w * a + n_out * a
        bwd_in = n_out * a + w * a + n_in * a
        bwd_w = n_out * a + n_in * a + w * 4
        bn = 2 * n_out * a  # stats pass read + bwd stats read
        bytes_ = (fwd + bwd_in + bwd_w + bn) * reps
        t = max(flops / PEAK_TFLOPS, bytes_ / HBM_BW)
        bound = "flops" if flops / PEAK_TFLOPS > bytes_ / HBM_BW \
            else "HBM"
        rows.append((name, reps, flops / 1e9, bytes_ / 1e6, t * 1e3,
                     bound))
        total_flops += flops
        total_bytes += bytes_
        total_time += t
    return rows, total_flops, total_bytes, total_time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--table", action="store_true")
    args = ap.parse_args()
    rows, fl, by, t = analyze(args.batch, args.img)
    if args.table:
        print(f"{'layer':<12}{'xN':>4}{'GFLOP':>10}{'MB':>10}"
              f"{'ms':>8}  bound")
        for r in rows:
            print(f"{r[0]:<12}{r[1]:>4}{r[2]:>10.1f}{r[3]:>10.0f}"
                  f"{r[4]:>8.2f}  {r[5]}")
    hbm_only = by / HBM_BW
    flops_only = fl / PEAK_TFLOPS
    print(json.dumps({
        "batch": args.batch,
        "tower_TFLOP": round(fl / 1e12, 2),
        "tower_GB": round(by / 1e9, 2),
        "per_layer_roofline_ms": round(t * 1e3, 1),
        "pure_flops_ms": round(flops_only * 1e3, 1),
        "pure_hbm_ms": round(hbm_only * 1e3, 1),
        "roofline_TFLOPs_effective": round(fl / t / 1e12, 1),
    }))


if __name__ == "__main__":
    main()
