"""Headline benchmarks. Prints one JSON line per metric
(``{"metric", "value", "unit", "vs_baseline", ...}``), most important last:

1. ``fused_logmel_throughput`` — mel frames/sec/chip through the Pallas fused
   framing+DFT+power+mel+log kernel (ops/pallas_mel.py) — the on-device
   replacement for the reference's host hot loop (mp.Pool(8) NumPy fbank per
   batch, reference examples/conformer/dataset.py:456-492). ``vs_baseline``
   is the speedup over the same feature computed on host CPU by *our own*
   NumPy parity layer (librosa isn't in the image; the NumPy path is the same
   math librosa runs). North star (BASELINE.json): >=5x host-CPU mel
   throughput per chip.
2. ``conformer_train_mfu`` — model-level headline: full flagship train step
   (on-device kaldi fbank + SpecAugment + 46M-param hybrid CTC/attention
   Conformer fwd/bwd + AdamW) at batch 32 x 10 s audio. ``value`` is MFU
   (XLA cost-analysis flops / step time / chip peak bf16 flops, percent);
   extra keys carry step_ms, sub-frames(tokens)/s, utts/s, audio x-realtime.
   ``vs_baseline`` is speedup over the round-1 measured 45 ms/step.
   The reference publishes no throughput numbers (SURVEY §6), so the quality
   bar is BASELINE.md CER and the perf bar is our own prior round.
"""

from __future__ import annotations

import json
import time

import numpy as np

N_FFT = 400
HOP = 160
N_MELS = 80
BATCH = 128
SECONDS = 10
SR = 16000


def _host_baseline_frames_per_sec(x: np.ndarray) -> float:
    """Host-CPU log-mel throughput on one clip batch slice (NumPy parity layer)."""
    from mindaudio_tpu.data import spectrum

    clip = x[:4]  # keep host run short; per-frame cost is size-independent
    t0 = time.perf_counter()
    mel = spectrum.melspectrogram(
        clip, n_fft=N_FFT, hop_length=HOP, n_mels=N_MELS, sample_rate=SR,
        pad_mode="constant",
    )
    np.log(np.maximum(mel, 1e-10))
    dt = time.perf_counter() - t0
    n_frames = clip.shape[0] * mel.shape[-1]
    return n_frames / dt


_PEAK_BF16_FLOPS = {
    # device_kind substring -> peak dense bf16 FLOP/s per chip
    "v5 lite": 197e12, "v5e": 197e12,
    "v5p": 459e12, "v5": 197e12,
    "v4": 275e12,
    "v6": 918e12, "trillium": 918e12,
    "v3": 123e12, "v2": 46e12,
}


def _peak_flops(device) -> float | None:
    kind = getattr(device, "device_kind", "").lower()
    for key, peak in _PEAK_BF16_FLOPS.items():
        if key in kind:
            return peak
    return None


def _flops_of(compiled) -> float | None:
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["flops"])
    except Exception:
        return None


def conformer_train_bench(batch_size=32, seconds=10, label_len=20,
                          vocab=4233):
    """Flagship train-step benchmark: MFU + tokens/s on the real chip.

    B=32 is the recipe default since round 3 (conformer.yaml batch_factor
    1.34): the measured utts/s knee — 820 vs 701 at B=16 (PERF.md B-sweep).
    """
    import jax
    import jax.numpy as jnp
    import optax

    from mindaudio_tpu.models.asr_model import ASRModel
    from mindaudio_tpu.ops.spectral import kaldi_fbank
    from mindaudio_tpu.ops.specaugment import spec_augment
    from mindaudio_tpu.train.state import (
        TrainState,
        as_dropout_key,
        clip_by_global_norm,
        fast_dropout_rng,
        skip_nonfinite_update,
    )
    from mindaudio_tpu.utils.common import add_sos_eos

    model = ASRModel(
        vocab_size=vocab, input_dim=80, d_model=256, head_num=4,
        ffn_dim=2048, num_encoder_layers=12, num_decoder_layers=6,
        kernel_size=15, ctc_weight=0.3, dtype=jnp.bfloat16,
    )

    frame_len, frame_shift = 400, 160
    # pad 10 s of audio to the recipe's MXU-aligned 1027-frame bucket
    # (t_sub = 256; examples/conformer/dataset.py BucketSampler) — unaligned
    # t_sub costs ~8% of the step (PERF.md ablation)
    n_frames = 1027
    wav_len = n_frames * frame_shift + frame_len
    true_len = seconds * SR

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

    def features(wavs, wav_lens, key):
        k_dither, k_aug = jax.random.split(key)
        feats = kaldi_fbank(wavs, num_mel_bins=80, dither=0.1, rng_key=k_dither)
        feat_lens = (1 + (wav_lens - frame_len) // frame_shift).astype(jnp.int32)
        feats = spec_augment(k_aug, feats)
        return feats, feat_lens

    def loss_fn(params, batch, key):
        k_feat, k_drop = jax.random.split(key)
        feats, feat_lens = features(batch["wavs"], batch["wav_lens"], k_feat)
        loss, metrics = model.apply(
            {"params": params}, dict(batch, feats=feats, feat_lens=feat_lens),
            deterministic=False, rngs={"dropout": k_drop},
        )
        return loss, metrics

    def step(state, batch):
        key = jax.random.fold_in(as_dropout_key(state.dropout_rng), state.step)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, key
        )
        grads, gnorm = clip_by_global_norm(grads, 5.0)
        new_state = skip_nonfinite_update(
            state, state.apply_gradients(grads=grads), loss, grads=grads
        )
        return new_state, loss

    params = model.init(
        jax.random.PRNGKey(0),
        {**{k: v for k, v in batch.items() if k not in ("wavs", "wav_lens")},
         "feats": jnp.zeros((batch_size, n_frames + 1, 80), jnp.float32),
         "feat_lens": jnp.full((batch_size,), n_frames + 1, jnp.int32)},
    )["params"]
    state = TrainState.create(
        apply_fn=model.apply, params=params,
        # bf16 mu mirrors the recipe default (conformer.yaml optim.mu_dtype)
        tx=optax.adamw(1e-3, weight_decay=1e-2, mu_dtype=jnp.bfloat16),
        dropout_rng=fast_dropout_rng(1),
    )

    # per-step FLOPs from the single-step compile (a fori_loop compile
    # reports whole-loop flops, which do not divide back reliably)
    compiled = jax.jit(step).lower(state, batch).compile()
    flops = _flops_of(compiled)

    # Slope timing (same protocol as the mel metric below and
    # benchmarks/ctc_step_ab.py, pinned in PERF.md round 4/5): the whole
    # n-step run goes under ONE jitted fori_loop at TWO iteration counts;
    # (t_hi - t_lo)/(n_hi - n_lo) cancels the ~25 ms/call tunnel dispatch
    # that the old chained-call loop charged to every step.
    n_lo, n_hi, reps = 4, 24, 5

    def make_loop(iters):
        def f(st, batch):
            def body(i, carry):
                s, _ = carry
                return step(s, batch)
            return jax.lax.fori_loop(0, iters, body,
                                     (st, jnp.float32(0.0)))
        return jax.jit(f)

    c_lo = make_loop(n_lo).lower(state, batch).compile()
    c_hi = make_loop(n_hi).lower(state, batch).compile()
    state, loss = c_lo(state, batch)
    state, loss = c_hi(state, batch)
    float(loss)  # warm both executables + tunnel

    t_lo, t_hi = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, loss = c_lo(state, batch)
        float(loss)
        t_lo.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        state, loss = c_hi(state, batch)
        float(loss)
        t_hi.append(time.perf_counter() - t0)
    slopes = sorted((hi - lo) / (n_hi - n_lo)
                    for lo, hi in zip(sorted(t_lo), sorted(t_hi)))[:3]
    dt = slopes[0]
    slope_spread = 100.0 * (slopes[-1] - slopes[0]) / slopes[0]

    dev = jax.devices()[0]
    peak = _peak_flops(dev)
    mfu = (100.0 * flops / dt / peak) if (flops and peak) else None
    # tokens = VALID subsampled frames (10 s of real audio), not bucket pad
    feat_valid = 1 + (true_len - frame_len) // frame_shift
    t_sub = ((feat_valid - 1) // 2 - 1) // 2  # Conv2dSubsampling4 output len
    sub_frames = batch_size * t_sub
    out = {
        "metric": "conformer_train_mfu",
        "value": round(mfu, 2) if mfu is not None else None,
        "unit": "percent_of_peak_bf16",
        "vs_baseline": round(0.045 / dt, 2),
        "step_ms": round(dt * 1e3, 2),
        "slope_spread_pct": round(slope_spread, 1),
        "tokens_per_sec": round(sub_frames / dt, 1),
        "utts_per_sec": round(batch_size / dt, 1),
        "audio_x_realtime": round(batch_size * seconds / dt, 1),
        "batch": batch_size,
        "flops_per_step": flops,
        "device_kind": getattr(dev, "device_kind", str(dev)),
    }
    print(json.dumps(out))


def main():
    import jax
    import jax.numpy as jnp

    from mindaudio_tpu.ops.pallas_mel import fused_logmel

    rng = np.random.default_rng(0)
    x = rng.standard_normal((BATCH, SECONDS * SR)).astype(np.float32)

    host_fps = _host_baseline_frames_per_sec(x)

    xd = jax.device_put(jnp.asarray(x))

    # Timing methodology (round 4, pinned): over the remote tunnel, per-call
    # dispatch RPCs and stalls added a run-to-run spread of ±30% to the old
    # 10-dispatch loop. The kernel now runs inside ONE jitted fori_loop whose
    # carry chains iteration-to-iteration (sum * 0.0 is NOT float-foldable),
    # timed at TWO iteration counts — the slope cancels the per-call
    # dispatch constant exactly. n_lo/n_hi/spread are recorded in the JSON.
    # a wide iteration gap (Δ=80) halves the slope's sensitivity to residual
    # tunnel stalls vs the original Δ=40, and a whole attempt is retried when
    # its best-3 slope spread exceeds 5% (an interfered session shows up as
    # spread — round-4 measured one 11%-spread run reading 13% high)
    n_lo, n_hi, n_rep = 8, 88, 7

    def make_loop(iters):
        @jax.jit
        def f(x0):
            def body(i, xx):
                out = fused_logmel(
                    xx, n_fft=N_FFT, hop_length=HOP, n_mels=N_MELS,
                    sample_rate=SR,
                )
                return xx + (jnp.sum(out) * 0.0).astype(xx.dtype)
            return jax.lax.fori_loop(0, iters, body, x0)[0, 0]
        return f

    f_lo, f_hi = make_loop(n_lo), make_loop(n_hi)
    float(f_lo(xd)), float(f_hi(xd))  # compile + tunnel cold path

    def one_attempt():
        t_lo, t_hi = [], []
        for _ in range(n_rep):
            t0 = time.perf_counter(); float(f_lo(xd))
            t_lo.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(f_hi(xd))
            t_hi.append(time.perf_counter() - t0)
        slopes = sorted(
            (hi - lo) / (n_hi - n_lo)
            for lo, hi in zip(sorted(t_lo), sorted(t_hi))
        )[:3]
        return slopes[0], 100.0 * (slopes[-1] - slopes[0]) / slopes[0]

    per_iter, spread_pct = one_attempt()
    for _ in range(2):
        if spread_pct <= 5.0:
            break
        cand_iter, cand_spread = one_attempt()
        if cand_spread < spread_pct:
            per_iter, spread_pct = cand_iter, cand_spread

    out_sd = jax.eval_shape(
        lambda v: fused_logmel(v, n_fft=N_FFT, hop_length=HOP, n_mels=N_MELS,
                               sample_rate=SR), xd)
    fps = out_sd.shape[0] * out_sd.shape[1] / per_iter
    print(json.dumps({
        "metric": "fused_logmel_throughput",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / host_fps, 2),
        "baseline": "own host NumPy parity layer (librosa-equivalent math)",
        "timing": {"method": "two-point slope, in-jit fori_loop",
                   "n_lo": n_lo, "n_hi": n_hi, "reps": n_rep,
                   "slope_spread_pct": round(spread_pct, 1)},
    }))

    conformer_train_bench()


if __name__ == "__main__":
    main()
