"""Where does the chip go in throughput mode?  (VERDICT r3 weak #3)

The batch-16 offline detector measured 25.2% MFU with "conv backbone
utilization" blamed but never measured.  This attributes the step time by
stage-knockout timing on hardware — jitted sub-programs that share the
input, each timed with a forced pull:

  backbone     ResNet-50 -> stage-4 features (conv stack, the FLOP bulk)
  detr_fwd     full DETR forward (backbone + input-proj + transformer + heads)
  full         BatchedDetector program (forward + postprocess/NMS/top-k)

transformer+heads = detr_fwd - backbone; postprocess = full - detr_fwd.
Each stage gets analytic FLOPs, achieved TFLOP/s, and MFU vs the v5e bf16
peak, turning "25% MFU" into "stage X runs at Y% of peak and is the
ceiling because Z".

Also attempts a jax.profiler trace (op-level, when the tunneled backend
supports it) into --trace_dir.

Usage: python scripts/profile_batched_detector.py [--batch 16] [--passes 5]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from bench_batched_detection import conv_flops_resnet50

PEAK_TFLOPS = 197.0  # TPU v5e bf16


def transformer_flops(L, Q, d, ffn, enc_layers, dec_layers, heads_out=7):
    """Forward FLOPs (2*MACs) of the DETR transformer + heads."""
    def attn(lq, lk):
        # qkv/out projections + scores + weighted sum
        return 2 * (3 * lq * d * d + lq * d * d) + 2 * (2 * lq * lk * d)

    def ffn_f(l):
        return 2 * (2 * l * d * ffn)

    enc = enc_layers * (attn(L, L) + ffn_f(L))
    dec = dec_layers * (attn(Q, Q) + attn(Q, L) + ffn_f(Q))
    heads = 2 * Q * d * d * 3 * heads_out  # 6 HeadMLPs approx (3-layer MLP)
    return enc + dec + heads


def conv_flops_per_stage(h, w):
    """Per-stage forward FLOPs of ResNet-50: {stem, layer1..4} (2*MACs)."""
    stages = {}
    flops = 0.0

    def conv(cin, cout, k, s, hw):
        nonlocal flops
        oh, ow = hw[0] // s, hw[1] // s
        flops += 2.0 * oh * ow * cin * cout * k * k
        return (oh, ow)

    hw = conv(3, 64, 7, 2, (h, w))
    stages["stem"] = flops
    hw = (hw[0] // 2, hw[1] // 2)  # maxpool
    cin = 64
    for stage, (blocks, mid) in enumerate(
        [(3, 64), (4, 128), (6, 256), (3, 512)]
    ):
        mark = flops
        for b in range(blocks):
            s = 2 if (b == 0 and stage > 0) else 1
            conv(cin, mid, 1, 1, hw)
            hw2 = conv(mid, mid, 3, s, hw)
            conv(mid, mid * 4, 1, 1, hw2)
            if b == 0:
                conv(cin, mid * 4, 1, s, hw)
            hw = hw2
            cin = mid * 4
        stages[f"layer{stage + 1}"] = flops - mark
    return stages


def main() -> None:
    import jax
    import jax.numpy as jnp

    from odam_tpu.utils import compile_cache

    compile_cache.enable()

    from odam_tpu.models import detr as detr_mod, resnet
    from odam_tpu.runtime import processor as proc_mod

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="+", default=[16])
    ap.add_argument("--passes", type=int, default=5)
    ap.add_argument("--reps", type=int, default=10,
                    help="calls per timed pass (amortizes dispatch)")
    ap.add_argument("--trace_dir", default=None)
    ap.add_argument("--pallas", choices=["on", "off"], default="on",
                    help="attention impl A/B: the round-3 kernel table shows "
                         "XLA ahead of the Pallas kernels at bf16")
    ap.add_argument("--stem", choices=["conv", "s2d", "im2col"],
                    default="conv",
                    help="backbone stem A/B/C: literal 7x7/s2 conv vs the "
                         "space-to-depth rewrite vs patch-matrix matmul "
                         "(same math, same params)")
    ap.add_argument("--per_stage", action="store_true",
                    help="also attribute the backbone per stage (stem + "
                         "layer1..4) via cumulative-prefix knockout: stage "
                         "k's cost = prefix(k) - prefix(k-1); XLA dead-code-"
                         "eliminates the unrequested deeper stages.  This is "
                         "the MEASURED per-layer conv roofline (VERDICT r4 "
                         "weak #5) replacing the argued one")
    args = ap.parse_args()

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    img_h, img_w = (800, 1071) if on_tpu else (160, 208)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    print(f"device: {dev} image {img_h}x{img_w} dtype {dtype.__name__}",
          file=sys.stderr)

    dcfg = detr_mod.DETRConfig(dtype=dtype, use_pallas=on_tpu and args.pallas == "on",
                               aux_loss=False, stem=args.stem)
    model = detr_mod.DETR(dcfg)
    params = model.init(jax.random.key(0), jnp.zeros((1, img_h, img_w, 3)))
    pcfg = proc_mod.PipelineConfig()
    K = jnp.asarray(np.array(
        [[1170.0, 0, img_w / 2], [0, 1170.0, img_h / 2], [0, 0, 1]],
        np.float32))
    w = jnp.asarray(float(img_w))
    h = jnp.asarray(float(img_h))

    backbone = resnet.ResNet(
        stage_sizes=resnet.RESNET50_STAGES,
        return_stages=(dcfg.backbone_stage,),
        dilate_last=dcfg.dilation, dtype=dtype, stem=dcfg.stem)
    bb_params = {"params": params["params"]["backbone"]}

    def stage_backbone(p, x):
        return backbone.apply(bb_params, x)[dcfg.backbone_stage]

    def stage_fwd(p, x):
        return model.apply(p, x)["pred_logits"]

    def stage_full(p, x):
        out = model.apply(p, x)
        return detr_mod.postprocess(
            out, w, h, jnp.asarray(pcfg.detect_threshold), K,
            max_dets=pcfg.max_dets).scores

    def force(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    # analytic FLOPs per frame
    fh, fw = img_h // 32, img_w // 32
    L = fh * fw
    conv_f, _ = conv_flops_resnet50(img_h, img_w)
    proj_f = 2 * L * 2048 * dcfg.hidden_dim
    tr_f = transformer_flops(L, dcfg.num_queries, dcfg.hidden_dim,
                             dcfg.dim_feedforward, dcfg.enc_layers,
                             dcfg.dec_layers)
    flops = {"backbone": conv_f, "transformer+heads": proj_f + tr_f,
             "postprocess": 0.0}

    for B in args.batch:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(0, 1, (B, img_h, img_w, 3))
                        .astype(np.float32))
        fns = {}
        for name, f in (("backbone", stage_backbone),
                        ("detr_fwd", stage_fwd), ("full", stage_full)):
            jf = jax.jit(f)
            t0 = time.time()
            force(jf(params, x))
            print(f"B={B} {name}: compile {time.time() - t0:.1f}s",
                  file=sys.stderr)
            fns[name] = jf

        med = {}
        for name, jf in fns.items():
            times = []
            for _ in range(args.passes):
                t0 = time.time()
                for _ in range(args.reps):
                    r = jf(params, x)
                force(r)
                times.append((time.time() - t0) / args.reps)
            med[name] = float(np.median(times))

        stage_ms = {
            "backbone": med["backbone"],
            "transformer+heads": max(med["detr_fwd"] - med["backbone"], 1e-9),
            "postprocess": max(med["full"] - med["detr_fwd"], 1e-9),
        }
        total = med["full"]
        print(f"\nB={B}  full {total * 1e3:.2f} ms/call "
              f"({B / total:.1f} fps, {1e3 * total / B:.2f} ms/frame)")
        for name, t in stage_ms.items():
            fl = flops[name] * B
            tf = fl / t / 1e12 if t > 0 else 0.0
            mfu = 100 * tf / PEAK_TFLOPS
            share = 100 * t / total
            print(f"  {name:>18}: {t * 1e3:7.2f} ms  {share:5.1f}%  "
                  f"{tf:6.1f} TF/s  MFU {mfu:5.1f}%"
                  + ("" if fl else "  (non-matmul)"))
        all_f = sum(flops.values()) * B
        print(f"  whole-program MFU: "
              f"{100 * all_f / total / 1e12 / PEAK_TFLOPS:.1f}%")

        if args.per_stage:
            # Cumulative-prefix knockout inside the backbone.  prefix(k)
            # jits the ResNet asking only for stage k's output — XLA
            # dead-code-eliminates stages k+1.. — so stage k's cost is
            # prefix(k) - prefix(k-1).  prefix(0) is the stem conv alone
            # (bn/relu/maxpool land in layer1's bucket; they are
            # bandwidth-bound elementwise ops, noted not hidden).
            stage_f = conv_flops_per_stage(img_h, img_w)
            kernel = params["params"]["backbone"]["conv1"]["kernel"]
            stem_fn = {"conv": resnet._stem_conv,
                       "s2d": resnet._stem_conv_s2d,
                       "im2col": resnet._stem_conv_im2col}[args.stem]
            prefix_fns = {0: jax.jit(lambda p, xx: stem_fn(xx.astype(dtype),
                                                           kernel, dtype))}
            for k in range(1, 5):
                bb_k = resnet.ResNet(
                    stage_sizes=resnet.RESNET50_STAGES, return_stages=(k,),
                    dilate_last=dcfg.dilation, dtype=dtype, stem=dcfg.stem)
                prefix_fns[k] = jax.jit(
                    lambda p, xx, m=bb_k, kk=k: m.apply(bb_params, xx)[kk])
            pre_ms = {}
            for k, jf in prefix_fns.items():
                t0 = time.time()
                force(jf(params, x))
                print(f"B={B} prefix({k}): compile {time.time() - t0:.1f}s",
                      file=sys.stderr)
                times = []
                for _ in range(args.passes):
                    t0 = time.time()
                    for _ in range(args.reps):
                        r = jf(params, x)
                    force(r)
                    times.append((time.time() - t0) / args.reps)
                pre_ms[k] = float(np.median(times))
            names = ["stem", "layer1", "layer2", "layer3", "layer4"]
            print(f"  per-stage backbone attribution (stem={args.stem}; "
                  f"prefix-knockout, medians of {args.passes}):")
            prev = 0.0
            for k, name in enumerate(names):
                t = max(pre_ms[k] - prev, 1e-9)
                prev = pre_ms[k]
                fl = stage_f[name] * B
                tf = fl / t / 1e12
                mfu = 100 * tf / PEAK_TFLOPS
                share = 100 * t / med["backbone"]
                extra = " (+bn/relu/maxpool)" if name == "layer1" else ""
                print(f"  {name:>18}: {t * 1e3:7.2f} ms  {share:5.1f}% of "
                      f"backbone  {tf:6.1f} TF/s  MFU {mfu:5.1f}%{extra}")
            print(f"  prefix(4) {pre_ms[4] * 1e3:.2f} ms vs whole backbone "
                  f"{med['backbone'] * 1e3:.2f} ms (consistency check)")

    if args.trace_dir:
        from odam_tpu.utils.metrics import profiler_trace

        try:
            with profiler_trace(args.trace_dir):
                force(fns["full"](params, x))
            print(f"trace written to {args.trace_dir}: "
                  f"{os.listdir(args.trace_dir)}")
        except Exception as e:  # tunneled backend may not support tracing
            print(f"jax.profiler trace unavailable here: {e!r}")


if __name__ == "__main__":
    main()
