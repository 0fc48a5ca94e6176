"""Separation functional convergence (Conv-TasNet or TasNet): train on a
synthetic 2-speaker corpus, then evaluate SI-SNRi and bss_eval SDRi on the
held-out split through the recipe eval path (reference
examples/conv_tasnet/eval.py and examples/tasnet/eval.py protocols).

This regenerates the PERF.md "functional convergence" separation rows — in
particular the SDRi column, which since round 3 uses the faithful BSS Eval
v3 512-tap projection (metric/snr.py) rather than a scalar projection, so
its scale is comparable to the reference's published LibriMix numbers.

Usage (CPU mesh is fine — the corpus is tiny):
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/separation_convergence.py [--steps 160] \
            [--model conv_tasnet|tasnet]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_corpus(root, n_utts=24, seconds=2.0, sr=8000, seed=0):
    """Synthetic 2-speaker mixtures: distinct harmonic stacks + AM noise so
    the separator has real structure to latch onto."""
    from mindaudio_tpu.data import io

    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    for split, n in (("tr", n_utts), ("tt", 8)):
        for part in ("mix", "s1", "s2"):
            os.makedirs(os.path.join(root, split, part), exist_ok=True)
        entries = {p: [] for p in ("mix", "s1", "s2")}
        for i in range(n):
            f1 = rng.uniform(100, 200)
            f2 = rng.uniform(300, 450)
            s1 = np.sin(2 * np.pi * f1 * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 1.3 * t))
            s1 += 0.3 * np.sin(2 * np.pi * 2 * f1 * t)
            s2 = np.sign(np.sin(2 * np.pi * f2 * t)) * 0.5
            s2 += 0.2 * rng.standard_normal(len(t)) * np.sin(2 * np.pi * 0.7 * t)
            s1, s2 = s1.astype(np.float32), s2.astype(np.float32)
            mix = s1 + s2
            for part, x in (("mix", mix), ("s1", s1), ("s2", s2)):
                path = os.path.join(root, split, part, f"u{i}.wav")
                io.write(path, x, sr)
                entries[part].append([path, len(x)])
        for part, ent in entries.items():
            with open(os.path.join(root, split, f"{part}.json"), "w") as f:
                json.dump(ent, f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=160)
    ap.add_argument("--model", choices=("conv_tasnet", "tasnet"),
                    default="conv_tasnet")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from mindaudio_tpu.data.librimix import separation_batch_iterator
    from mindaudio_tpu.loss.separation_loss import pit_si_snr_loss
    from mindaudio_tpu.metric.snr import cal_SDRi, cal_SISNRi
    from mindaudio_tpu.models.conv_tasnet import ConvTasNet
    from mindaudio_tpu.models.tasnet import TasNet

    root = tempfile.mkdtemp(prefix="sep_conv_")
    sr, seconds = 8000, 2.0
    make_corpus(root, seconds=seconds, sr=sr)
    seg = int(seconds * sr)

    if args.model == "tasnet":
        model = TasNet(enc_dim=128, frame_len=40, num_spk=2, hidden=128,
                       num_layers=2)

        def forward(params, mix):
            # frame → mask → overlap-add (recipe separate_full,
            # examples/tasnet/train.py)
            frames = model.frame_waveform(mix)
            est_frames = model.apply({"params": params}, frames)
            est = model.reconstruct(est_frames)
            t = mix.shape[-1]
            if est.shape[-1] < t:
                est = jnp.pad(est, ((0, 0), (0, 0), (0, t - est.shape[-1])))
            return est[..., :t]

        def init_params(mix):
            return model.init(jax.random.PRNGKey(0),
                              model.frame_waveform(mix))["params"]
    else:
        model = ConvTasNet(enc_dim=128, win_len=16, bottleneck=64, hidden=128,
                           kernel_size=3, num_blocks=4, num_repeats=2,
                           num_spk=2)

        def forward(params, mix):
            return model.apply({"params": params}, mix)

        def init_params(mix):
            return model.init(jax.random.PRNGKey(0), mix)["params"]

    it = separation_batch_iterator(os.path.join(root, "tr"), 8, seg,
                                   epochs=10_000, seed=1)
    _, first = next(it)
    params = init_params(jnp.asarray(first["mix"]))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, mix, src, lengths):
        def loss_fn(p):
            est = forward(p, mix)
            loss, _ = pit_si_snr_loss(est, src, lengths)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    loss = None
    for i, (_, batch) in enumerate(it):
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(batch["mix"]),
            jnp.asarray(batch["src"]), jnp.asarray(batch["lengths"]))
        if i + 1 >= args.steps:
            break
        if (i + 1) % 40 == 0:
            print(f"step {i + 1}: pit -si_snr {float(loss):.3f}")

    @jax.jit
    def separate(mix, src, lengths):
        est = forward(params, mix)
        _, perm = pit_si_snr_loss(est, src, lengths)
        return est, jnp.take_along_axis(src, perm[:, :, None], axis=1)

    si_snri = sdri = count = 0
    for _, batch in separation_batch_iterator(os.path.join(root, "tt"), 1,
                                              seg, epochs=1, shuffle=False):
        est, src = separate(jnp.asarray(batch["mix"]),
                            jnp.asarray(batch["src"]),
                            jnp.asarray(batch["lengths"]))
        n = int(batch["lengths"][0])
        est = np.asarray(est)[0, :, :n]
        src = np.asarray(src)[0, :, :n]
        mix = batch["mix"][0, :n]
        si_snri += cal_SISNRi(src, est, mix)[0]
        sdri += cal_SDRi(src, est, mix)[0]
        count += 1

    print(json.dumps({
        "steps": args.steps, "final_loss": float(loss), "utts": count,
        "si_snri_db": round(float(si_snri) / count, 2),
        "sdri_db_bss_eval": round(float(sdri) / count, 2),
    }))


if __name__ == "__main__":
    main()
