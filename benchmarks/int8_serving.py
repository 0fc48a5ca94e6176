"""Batch-1 greedy decode latency, bf16 vs weight-only int8 (PERF.md).

Run on a real chip: python benchmarks/int8_serving.py
"""
import sys, time, json
sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp

from mindaudio_tpu.models.asr_model import ASRModel
from mindaudio_tpu.utils.recognize import ASRInference

model = ASRModel(vocab_size=4233, input_dim=80, d_model=256, head_num=4,
                 ffn_dim=2048, num_encoder_layers=12, num_decoder_layers=6,
                 kernel_size=15, ctc_weight=0.3, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
feats = rng.standard_normal((1, 1028, 80)).astype(np.float32)
feat_lens = np.asarray([998], np.int32)
batch = {
    "feats": jnp.asarray(feats), "feat_lens": jnp.asarray(feat_lens),
    "labels": jnp.asarray(rng.integers(1, 4000, (1, 8)).astype(np.int32)),
    "label_lens": jnp.asarray([8], jnp.int32),
    "ys_in": jnp.asarray(rng.integers(1, 4000, (1, 9)).astype(np.int32)),
    "ys_out": jnp.asarray(rng.integers(1, 4000, (1, 9)).astype(np.int32)),
    "ys_lens": jnp.asarray([9], jnp.int32),
}
params = model.init(jax.random.PRNGKey(0), batch)["params"]

out = {}
for name, kw in [("bf16", {}), ("int8", {"weight_quant": "int8"})]:
    inf = ASRInference(model, {"params": params}, beam_size=10,
                       max_tgt_len=50, **kw)
    t0 = time.time()
    inf.ctc_greedy_search(feats, feat_lens)
    print(name, "compile+first:", round(time.time() - t0, 1), "s", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            h, _ = inf.ctc_greedy_search(feats, feat_lens)
        best = min(best, (time.perf_counter() - t0) / 10)
    out[name + "_greedy_b1_ms"] = round(best * 1e3, 2)
out["speedup"] = round(out["bf16_greedy_b1_ms"] / out["int8_greedy_b1_ms"], 2)
print(json.dumps(out))
