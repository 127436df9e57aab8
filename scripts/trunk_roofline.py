"""Analytic roofline for the ResNet50 trunk at detector canvas.

The measured trunk marginal (~26 TFLOP/s bf16 at 832x1344 b4, PERF.md
r2) looks far from the v5e's 197 TFLOP/s peak — but peak is the wrong
ceiling for 1x1-heavy bottleneck stages at large spatial extent: their
arithmetic intensity sits well below the v5e's ~240 FLOP/byte
machine balance (197e12 / 819e9), so they are HBM-BANDWIDTH bound.
This script prints, per stage: FLOPs, a best-case HBM byte count
(every conv reads its input once and writes its output once, weights
once, norm/ReLU fully fused into conv epilogues, residual adds fused
into the expand conv's epilogue — i.e. XLA fusing perfectly), the
arithmetic intensity, and the roofline floor max(compute, bandwidth)
— the number the measured marginals should be compared against
instead of peak TFLOP/s.

Pure host math; no TPU needed. Run:
    python scripts/trunk_roofline.py [--canvas 832 1344] [--batch 4]
    [--bytes-per-elt 2]
"""
import argparse
import json

PEAK_BF16 = 197e12     # v5e MXU, FLOP/s
PEAK_INT8 = 394e12
HBM_BW = 819e9         # bytes/s


def conv_cost(cin, cout, k, h, w, stride, bpe):
    """(flops, bytes) for one conv: read in, write out, weights."""
    ho, wo = h // stride, w // stride
    flops = 2 * k * k * cin * cout * ho * wo
    bytes_ = (h * w * cin + ho * wo * cout) * bpe + k * k * cin * cout * bpe
    return flops, bytes_, ho, wo


def stage_cost(cin, width, blocks, h, w, stride, batch, bpe):
    """ResNet bottleneck stage totals (flops, bytes, out shape)."""
    flops = bytes_ = 0
    for b in range(blocks):
        s = stride if b == 0 else 1
        f1, by1, _, _ = conv_cost(cin, width, 1, h, w, 1, bpe)
        f2, by2, ho, wo = conv_cost(width, width, 3, h, w, s, bpe)
        f3, by3, _, _ = conv_cost(width, 4 * width, 1, ho, wo, 1, bpe)
        flops += f1 + f2 + f3
        bytes_ += by1 + by2 + by3
        if b == 0:
            fd, byd, _, _ = conv_cost(cin, 4 * width, 1, h, w, s, bpe)
            flops += fd
            bytes_ += byd
        else:
            # residual add: read shortcut, fused into expand epilogue
            bytes_ += ho * wo * 4 * width * bpe
        cin, h, w = 4 * width, ho, wo
    return flops * batch, bytes_ * batch, cin, h, w


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--canvas", nargs=2, type=int, default=(832, 1344))
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--bytes-per-elt", type=float, default=2.0,
                    help="2 = bf16 activations; 1 = int8")
    args = ap.parse_args()
    h, w = args.canvas
    bpe = args.bytes_per_elt
    peak = PEAK_BF16 if bpe >= 2 else PEAK_INT8

    # stem: 7x7/2 conv + fused 3x3/2 maxpool
    f, by, ho, wo = conv_cost(3, 64, 7, h, w, 2, bpe)
    by += (ho * wo * 64 + (ho // 2) * (wo // 2) * 64) * bpe  # pool r+w
    rows = [("stem", f * args.batch, by * args.batch)]
    cin, hh, ww = 64, ho // 2, wo // 2
    for name, blocks, width, stride in [("layer1", 3, 64, 1),
                                        ("layer2", 4, 128, 2),
                                        ("layer3", 6, 256, 2),
                                        ("layer4", 3, 512, 2)]:
        fl, byt, cin, hh, ww = stage_cost(cin, width, blocks, hh, ww,
                                          stride, args.batch, bpe)
        rows.append((name, fl, byt))

    tot_f = tot_b = tot_ms = 0.0
    for name, fl, byt in rows:
        t_c = fl / peak
        t_b = byt / HBM_BW
        floor = max(t_c, t_b)
        tot_f += fl
        tot_b += byt
        tot_ms += floor * 1e3
        print(json.dumps({
            "stage": name, "gflop": round(fl / 1e9, 1),
            "mbytes": round(byt / 1e6, 1),
            "ai_flop_per_byte": round(fl / byt, 1),
            "bound": "bw" if t_b > t_c else "compute",
            "floor_ms": round(floor * 1e3, 2),
            "floor_tflops": round(fl / floor / 1e12, 1),
        }))
    print(json.dumps({
        "stage": "TOTAL", "gflop": round(tot_f / 1e9, 1),
        "mbytes": round(tot_b / 1e6, 1),
        "floor_ms": round(tot_ms, 2),
        "implied_tflops_at_floor": round(tot_f / (tot_ms / 1e3) / 1e12,
                                         1),
        "machine_balance_flop_per_byte": round(peak / HBM_BW, 0),
    }))


if __name__ == "__main__":
    main()
