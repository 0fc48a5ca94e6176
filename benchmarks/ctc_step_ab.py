"""Within-process A/B of the CTC implementation on the FULL flagship step.

VERDICT r4 #1(c): slope-time the B=32 train step with the Pallas CTC DP
kernel on vs the lax.scan path, inside ONE process, with the whole
10..30-step run under a single jitted ``fori_loop`` so the ~25 ms/call
tunnel dispatch constant cancels in the slope (methodology pinned in
PERF.md round 4: naive chained-call timing has a +-3.5 ms variant-order
drift — bigger than the expected ~3.8 ms CTC delta itself).

Run on the real chip:  python benchmarks/ctc_step_ab.py [pallas scan ...]

Prints one JSON line per variant: slope step_ms (best-3 pairing), spread,
MFU from XLA cost analysis, plus the loss after the first timed block so
numeric agreement between the two paths is visible in the artifact.
"""
import json
import sys
import time

sys.path.insert(0, __import__("os").path.join(
    __import__("os").path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from mindaudio_tpu.models.asr_model import ASRModel
from mindaudio_tpu.ops.spectral import kaldi_fbank
from mindaudio_tpu.ops.specaugment import spec_augment
from mindaudio_tpu.train.state import (
    TrainState, as_dropout_key, clip_by_global_norm, fast_dropout_rng,
    skip_nonfinite_update)
from mindaudio_tpu.utils.common import add_sos_eos

SR = 16000
N_LO, N_HI, REPS = 4, 24, 7


def build(ctc_impl, batch_size=32, n_frames=1027, label_len=20, vocab=4233,
          d_model=256, head_num=4, ffn_dim=2048, int8_ffn=False, remat=False):
    """Flagship train step (mirrors bench.py::conformer_train_bench)."""
    model = ASRModel(vocab_size=vocab, input_dim=80, d_model=d_model,
                     head_num=head_num, ffn_dim=ffn_dim,
                     num_encoder_layers=12, num_decoder_layers=6,
                     kernel_size=15, ctc_weight=0.3, ctc_impl=ctc_impl,
                     int8_ffn=int8_ffn, remat=remat, dtype=jnp.bfloat16)
    frame_len, frame_shift = 400, 160
    wav_len = n_frames * frame_shift + frame_len
    true_len = 10 * SR
    rng = np.random.default_rng(0)
    wavs = np.zeros((batch_size, wav_len), np.float32)
    wavs[:, :true_len] = rng.standard_normal(
        (batch_size, true_len)).astype(np.float32) * 0.1
    labels = rng.integers(1, vocab - 1, (batch_size, label_len)).astype(np.int32)
    sos = eos = vocab - 1
    ys_in, ys_out = add_sos_eos(labels, sos, eos)
    batch = {
        "wavs": jnp.asarray(wavs),
        "wav_lens": jnp.full((batch_size,), true_len, jnp.int32),
        "labels": jnp.asarray(labels),
        "label_lens": jnp.full((batch_size,), label_len, jnp.int32),
        "ys_in": jnp.asarray(ys_in.astype(np.int32)),
        "ys_out": jnp.asarray(ys_out.astype(np.int32)),
        "ys_lens": jnp.full((batch_size,), label_len + 1, jnp.int32),
    }

    def loss_fn(params, batch, key):
        k_feat, k_drop = jax.random.split(key)
        k_dither, k_aug = jax.random.split(k_feat)
        feats = kaldi_fbank(batch["wavs"], num_mel_bins=80, dither=0.1,
                            rng_key=k_dither)
        feat_lens = (1 + (batch["wav_lens"] - frame_len)
                     // frame_shift).astype(jnp.int32)
        feats = spec_augment(k_aug, feats)
        loss, metrics = model.apply(
            {"params": params}, dict(batch, feats=feats, feat_lens=feat_lens),
            deterministic=False, rngs={"dropout": k_drop})
        return loss, metrics

    def step(state, batch):
        key = jax.random.fold_in(as_dropout_key(state.dropout_rng), state.step)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, key)
        grads, gnorm = clip_by_global_norm(grads, 5.0)
        new_state = skip_nonfinite_update(
            state, state.apply_gradients(grads=grads), loss, grads=grads)
        return new_state, loss

    params = model.init(
        jax.random.PRNGKey(0),
        {**{k: v for k, v in batch.items() if k not in ("wavs", "wav_lens")},
         "feats": jnp.zeros((batch_size, n_frames + 1, 80), jnp.float32),
         "feat_lens": jnp.full((batch_size,), n_frames + 1, jnp.int32)},
    )["params"]
    state = TrainState.create(
        apply_fn=model.apply, params=params,
        tx=optax.adamw(1e-3, weight_decay=1e-2, mu_dtype=jnp.bfloat16),
        dropout_rng=fast_dropout_rng(1))
    return step, state, batch


def make_loop(step, iters):
    def f(state, batch):
        def body(i, carry):
            st, _ = carry
            st, loss = step(st, batch)
            return st, loss
        return jax.lax.fori_loop(0, iters, body,
                                 (state, jnp.float32(0.0)))
    return jax.jit(f)


def flops_of(compiled):
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["flops"])
    except Exception:
        return None


def main(variants):
    """variants: list of (name, build_kwargs) pairs, timed interleaved."""
    if variants and isinstance(variants[0], str):
        variants = [(v, {"ctc_impl": v}) for v in variants]
    built = {}
    for v, kw in variants:
        step, state, batch = build(**kw)
        t0 = time.perf_counter()
        # single-step compile for cost analysis (per-step FLOPs); the loop
        # compiles report whole-loop flops, which fori_loop does not scale
        c1 = jax.jit(step).lower(state, batch).compile()
        flops = flops_of(c1)
        print(f"# {v}: single-step compile {time.perf_counter()-t0:.0f}s",
              flush=True)
        t0 = time.perf_counter()
        c_lo = make_loop(step, N_LO).lower(state, batch).compile()
        c_hi = make_loop(step, N_HI).lower(state, batch).compile()
        print(f"# {v}: loop compiles {time.perf_counter()-t0:.0f}s", flush=True)
        # warm both iteration counts + tunnel
        st, loss = c_lo(state, batch)
        st, loss = c_hi(st, batch)
        jax.block_until_ready(loss)
        print(f"# {v}: warm, loss {float(loss):.4f}", flush=True)
        built[v] = dict(c_lo=c_lo, c_hi=c_hi, state=st, batch=batch,
                        flops=flops, t_lo=[], t_hi=[], loss=float(loss))

    # interleave variants rep-by-rep so drift hits both equally
    for _ in range(REPS):
        for v, _kw in variants:
            b = built[v]
            st = b["state"]
            t0 = time.perf_counter()
            st, loss = b["c_lo"](st, b["batch"]); float(loss)
            b["t_lo"].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            st, loss = b["c_hi"](st, b["batch"]); float(loss)
            b["t_hi"].append(time.perf_counter() - t0)
            b["state"] = st

    dev = jax.devices()[0]
    peak = {"v5 lite": 197e12, "v5e": 197e12, "v5p": 459e12, "v4": 275e12,
            "v6": 918e12}.get(
        next((k for k in ("v5 lite", "v5e", "v5p", "v4", "v6")
              if k in getattr(dev, "device_kind", "").lower()), None), None)
    for v, _kw in variants:
        b = built[v]
        slopes = sorted(
            (hi - lo) / (N_HI - N_LO)
            for lo, hi in zip(sorted(b["t_lo"]), sorted(b["t_hi"])))[:3]
        dt = slopes[0]
        spread = 100.0 * (slopes[-1] - slopes[0]) / slopes[0]
        mfu = (100.0 * b["flops"] / dt / peak) if (b["flops"] and peak) else None
        print(json.dumps({
            "variant": v, "step_ms": round(dt * 1e3, 2),
            "slope_spread_pct": round(spread, 1),
            "mfu_pct": round(mfu, 2) if mfu else None,
            "flops_per_step": b["flops"],
            "warmup_loss": round(b["loss"], 4) if b["loss"] is not None else None,
            "n_lo": N_LO, "n_hi": N_HI, "reps": REPS,
            "device_kind": getattr(dev, "device_kind", str(dev)),
        }), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["pallas", "scan"])
