"""Production-dims measured point (VERDICT r4 #3).

One Conformer at d_model=512 / ffn=4096 / 8 heads (~180 M params — the
production-scale encoder class the round-4 int8 analysis extrapolated to),
B=16 and B=32, slope-timed with the ctc_step_ab harness:

- bf16 MFU — tests round-4's "bigger d_model -> higher MFU for free";
- ``int8_ffn=True`` A/B at the same dims — tests "int8 training compute
  needs K,N >= 1-2k to pay" (PERF.md round-4), measured instead of
  extrapolated from isolated-matmul slopes.

Run on the real chip:  python benchmarks/prod_dims_ab.py
"""
import sys

sys.path.insert(0, __import__("os").path.join(
    __import__("os").path.dirname(__file__), ".."))

from ctc_step_ab import main  # noqa: E402  (shared slope-timing harness)

D512 = dict(d_model=512, head_num=8, ffn_dim=4096)

if __name__ == "__main__":
    which = sys.argv[1:] or ["d512_b16_bf16", "d512_b32_bf16", "d512_b32_int8"]
    variants = [(name, kw) for name, kw in [
        ("d512_b16_bf16", dict(ctc_impl="auto", batch_size=16, **D512)),
        ("d512_b32_bf16", dict(ctc_impl="auto", batch_size=32, **D512)),
        ("d512_b32_int8", dict(ctc_impl="auto", batch_size=32, int8_ffn=True,
                               **D512)),
        # round-5 batch-scaling legs: does B=64 still pay at d512, and does
        # remat (recompute activations in bwd) buy enough HBM to matter?
        ("d512_b64_bf16", dict(ctc_impl="auto", batch_size=64, **D512)),
        ("d512_b64_remat", dict(ctc_impl="auto", batch_size=64, remat=True,
                                **D512)),
    ] if name in which]
    main(variants)
