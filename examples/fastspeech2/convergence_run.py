"""FastSpeech2 convergence run: train to real held-out prosody/mel numbers.

Mirrors the conformer/ECAPA cipher-corpus protocol (PERF.md): a synthetic
corpus whose text→prosody mapping is LEARNABLE — every phone id carries
deterministic duration / pitch / energy rules and a distinct spectral
envelope (formant stack), so a correctly-trained FastSpeech2 must recover
them on HELD-OUT phone sequences. This fills the one convergence-matrix row
the reference never measures either (its README ships only a checkpoint,
reference examples/fastspeech2/README.md).

Reported on the held-out split, all through ``FastSpeech2.infer`` (text
only — no teacher forcing):

- duration MAE (frames/phone) + exact-match rate,
- pitch MAE (Hz/phone, unvoiced excluded) and energy MAE,
- mel L1 (time-aligned by predicted length) and MCD-13 (dB),
- optionally (--wavegrad_ckpt) FS2→WaveGrad end-to-end: vocode a held-out
  sample and report the mel L1 between the re-analyzed audio and the FS2
  mel (plus a white-noise baseline for scale).

Artifacts (committed): ``convergence/results.json``,
``convergence/loss_curve.json``, one held-out ``mel_pred.npy``/``mel_gt.npy``.

Usage (real chip or CPU mesh):
    python convergence_run.py [--steps 4000] [--utts 2048] [--wavegrad_ckpt D]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "../.."))
sys.path.insert(0, HERE)

SR = 24000
HOP = 300          # WaveGrad's fixed hop (up-factor product) → vocodable
N_FFT = 1024
N_MELS = 128       # WaveGrad default mel count
N_PHONES = 40      # phone ids 1..N_PHONES (0 = pad)
MAX_PH = 24
MAX_MEL = 320


def phone_rules(p: int):
    """Deterministic per-phone prosody means: the learnable ground truth."""
    dur = 4 + (p * 7) % 8                        # 4..11 frames
    f0 = 110.0 * 2.0 ** (((p * 5) % 13) / 13.0)  # 110..213 Hz
    energy = 0.35 + 0.6 * ((p * 3) % 9) / 8.0    # 0.35..0.95
    return dur, f0, energy


# Continuous prosody jitter around the per-phone means (realized values are
# stored as the pitch/energy targets, like f0 extraction on real speech).
# This is load-bearing for FREE-RUNNING eval, not decoration: with exactly
# N_PHONES discrete pitch values, only ~13 of the adaptor's 256 pitch
# buckets ever receive gradient, so a 3.5 Hz prediction error lands in an
# adjacent UNTRAINED N(0,1)-random embedding and corrupts that phone's
# features (measured: 50% bucket mismatch -> free-running MCD 118 dB while
# gt-pitch/energy inference scored 26 dB). Continuous jitter trains the
# bucket neighborhoods the predictor actually hits, as real speech does.
PITCH_JITTER_UTT = 0.02    # per-utterance log2-f0 scale sigma (~1.4%)
PITCH_JITTER_PHONE = 0.01  # per-phone log2-f0 sigma (~0.7%)
ENERGY_JITTER = 0.05       # per-phone multiplicative sigma


def realize_prosody(rng, phones):
    """Sample realized per-phone (f0 Hz, energy) around the rule means."""
    mean_f0 = np.array([phone_rules(int(p))[1] for p in phones])
    mean_en = np.array([phone_rules(int(p))[2] for p in phones])
    utt_scale = 2.0 ** rng.normal(0.0, PITCH_JITTER_UTT)
    f0 = mean_f0 * utt_scale * 2.0 ** rng.normal(
        0.0, PITCH_JITTER_PHONE, size=len(phones))
    en = mean_en * (1.0 + rng.normal(0.0, ENERGY_JITTER, size=len(phones)))
    return f0, np.clip(en, 0.05, 1.2)


def phone_envelope(p: int):
    """Distinct per-phone spectral envelope: 3 formant peaks."""
    rng = np.random.default_rng(1000 + p)
    formants = np.sort(rng.uniform(300.0, 7000.0, size=3))
    bws = rng.uniform(80.0, 250.0, size=3)
    amps = rng.uniform(0.4, 1.0, size=3)
    return formants, bws, amps


def synth_utterance(rng, phones, f0s=None, energies=None):
    """Audio for a phone sequence under the rules (+ realized prosody)."""
    chunks = []
    for j, p in enumerate(phones):
        dur, f0, energy = phone_rules(int(p))
        if f0s is not None:
            f0, energy = float(f0s[j]), float(energies[j])
        n = dur * HOP
        t = np.arange(n) / SR
        formants, bws, amps = phone_envelope(int(p))
        # all harmonics at once: (K, n) bank shaped by the formant envelope
        fk = np.arange(1, int(SR / 2 / f0) + 1, dtype=np.float64) * f0
        fk = fk[fk < SR / 2]
        a = (amps[None, :] * np.exp(
            -0.5 * ((fk[:, None] - formants[None, :]) / bws[None, :]) ** 2)
        ).sum(1) + 0.02  # spectral floor so every harmonic exists
        phases = rng.uniform(0, 2 * np.pi, size=len(fk))
        x = (a[:, None] * np.sin(
            2 * np.pi * fk[:, None] * t[None, :] + phases[:, None])).sum(0)
        x *= energy / (np.abs(x).max() + 1e-9)
        # 5 ms raised-cosine edges avoid clicks at phone boundaries
        edge = int(0.005 * SR)
        env = np.ones(n)
        env[:edge] = 0.5 - 0.5 * np.cos(np.pi * np.arange(edge) / edge)
        env[-edge:] = env[:edge][::-1]
        chunks.append(x * env)
    wav = np.concatenate(chunks)
    wav += 0.003 * rng.standard_normal(len(wav))
    return wav.astype(np.float32)


def build_corpus(out_dir, n_utts, seed=0, write_wavs=False):
    """Write FS2 feature .npy files (+train/dev lists, + optional wavs)."""
    from mindaudio_tpu.data import io, spectrum

    os.makedirs(out_dir, exist_ok=True)
    wav_dir = os.path.join(out_dir, "wavs")
    if write_wavs:
        os.makedirs(wav_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    names = []
    for i in range(n_utts):
        n_ph = int(rng.integers(8, MAX_PH + 1))
        phones = rng.integers(1, N_PHONES + 1, size=n_ph).astype(np.int32)
        f0s, energies = realize_prosody(rng, phones)
        wav = synth_utterance(rng, phones, f0s, energies)
        durs = np.array([phone_rules(int(p))[0] for p in phones], np.int32)
        # targets are the REALIZED values, as f0/energy extraction on real
        # speech would produce — not the rule means
        pitch = np.log1p(f0s).astype(np.float32)
        energy = (energies * 5.0).astype(np.float32)
        mel = spectrum.melspectrogram(
            wav[: durs.sum() * HOP], n_fft=N_FFT, hop_length=HOP,
            win_length=N_FFT, n_mels=N_MELS, sample_rate=SR,
            norm="slaney", mel_type="slaney",
        )
        mel = np.log(np.maximum(mel, 1e-5)).T.astype(np.float32)
        name = f"utt{i:05d}"
        np.save(os.path.join(out_dir, name + ".npy"),
                {"phonemes": phones, "pitch": pitch, "energy": energy,
                 "duration": durs, "mel": mel[: durs.sum()]},
                allow_pickle=True)
        if write_wavs:
            io.write(os.path.join(wav_dir, name + ".wav"), wav, SR)
        names.append(name)
    n_dev = max(32, n_utts // 16)
    with open(os.path.join(out_dir, "train.txt"), "w") as f:
        f.write("\n".join(names[:-n_dev]))
    with open(os.path.join(out_dir, "dev.txt"), "w") as f:
        f.write("\n".join(names[-n_dev:]))
    return names[-n_dev:]


def fs2_mel_to_wavegrad(ln_mel):
    """FS2 ln(power-mel) → WaveGrad's [0,1] dB convention (generate.py:79)."""
    return np.clip((10.0 * ln_mel / np.log(10.0) + 80.0) / 100.0,
                   0.0, 1.0).astype(np.float32)


def prepare_wavegrad_corpus(corpus_dir, out_dir):
    """Corpus wavs → WaveGrad (audio, mel) features in the SAME mel
    convention ``vocode_e2e`` feeds the vocoder, so the e2e leg is trained
    and driven consistently. Counterpart of examples/wavegrad/preprocess.py
    for the synthetic convergence corpus."""
    from mindaudio_tpu.data import io, spectrum

    os.makedirs(out_dir, exist_ok=True)
    wav_dir = os.path.join(corpus_dir, "wavs")
    entries = []
    for name in sorted(os.listdir(wav_dir)):
        if not name.endswith(".wav"):
            continue
        utt = os.path.splitext(name)[0]
        wav, _ = io.read(os.path.join(wav_dir, name))
        wav = np.asarray(wav, np.float32)
        n_frames = len(wav) // HOP
        wav = wav[: n_frames * HOP]
        mel = spectrum.melspectrogram(
            wav, n_fft=N_FFT, hop_length=HOP, win_length=N_FFT,
            n_mels=N_MELS, sample_rate=SR, norm="slaney", mel_type="slaney",
        )[:, :n_frames]
        mel = fs2_mel_to_wavegrad(np.log(np.maximum(mel, 1e-5))).T
        np.save(os.path.join(out_dir, utt + ".npy"),
                {"audio": wav, "mel": mel.astype(np.float32)})
        entries.append(utt)
    with open(os.path.join(out_dir, "train.txt"), "w") as f:
        f.write("\n".join(entries))
    print(f"wrote {len(entries)} wavegrad utterances to {out_dir}")


def _cep13(a):
    from scipy.fftpack import dct

    return dct(a, type=2, axis=-1, norm="ortho")[:, 1:14]


def mcd_db(a, b):
    """MCD-13 (dB) between two aligned log-mel matrices (T, n_mels)."""
    ca, cb = _cep13(a), _cep13(b)
    return float((10.0 / np.log(10.0)) * np.mean(
        np.sqrt(2.0 * np.sum((ca - cb) ** 2, axis=-1))))


def mcd_dtw_db(a, b):
    """DTW-aligned MCD-13 (dB): the standard free-running TTS metric.

    Frame-wise MCD counts every frame a duration error SHIFTS as a full
    spectral error; aligning with dynamic time warping first (steps
    (1,0),(0,1),(1,1), path-length-normalized) isolates spectral quality
    from prosody-induced time drift.
    """
    ca, cb = _cep13(a), _cep13(b)
    # (T1, T2) frame-pair MCD costs
    d2 = ((ca[:, None, :] - cb[None, :, :]) ** 2).sum(-1)
    cost = (10.0 / np.log(10.0)) * np.sqrt(2.0 * np.maximum(d2, 0.0))
    t1, t2 = cost.shape

    # anti-diagonal DP (cells on diagonal i+j depend only on the previous
    # two diagonals), vectorized over each diagonal; `steps` tracks the
    # chosen path's length for the normalization
    inf = np.inf
    prev2 = np.full(t1 + 1, inf)   # accumulated cost on diagonal d-2, by i
    prev1 = np.full(t1 + 1, inf)   # diagonal d-1
    s_prev2 = np.zeros(t1 + 1, np.int64)
    s_prev1 = np.zeros(t1 + 1, np.int64)
    prev2[0] = 0.0                 # acc[0, 0]
    for d in range(2, t1 + t2 + 1):
        cur = np.full(t1 + 1, inf)
        s_cur = np.zeros(t1 + 1, np.int64)
        i = np.arange(max(1, d - t2), min(t1, d - 1) + 1)
        if i.size:
            cand = np.stack([prev1[i],       # left  (i, j-1)
                             prev1[i - 1],   # up    (i-1, j)
                             prev2[i - 1]])  # diag  (i-1, j-1)
            s_cand = np.stack([s_prev1[i], s_prev1[i - 1], s_prev2[i - 1]])
            k = np.argmin(cand, axis=0)
            cols = np.arange(i.size)
            cur[i] = cost[i - 1, d - i - 1] + cand[k, cols]
            s_cur[i] = s_cand[k, cols] + 1
        prev2, prev1 = prev1, cur
        s_prev2, s_prev1 = s_prev1, s_cur
    return float(prev1[t1] / s_prev1[t1])


def evaluate(cfg, params, dev_names, feature_dir, out_dir,
             wavegrad_ckpt=""):
    import jax
    import jax.numpy as jnp

    from train import build_model

    fs2, _ = build_model(cfg)
    # pin params on device once — numpy leaves restored from the checkpoint
    # would otherwise be re-uploaded on EVERY jit call (~100 MB/utt over the
    # tunnel; measured: dominates eval wall time)
    params = jax.device_put(params)
    infer = jax.jit(lambda p, ph, sl: fs2.apply(
        {"params": p}, ph, sl, MAX_MEL, method=fs2.infer))
    # teacher-forced forward (gt duration/pitch/energy): frame-aligned mel
    # metrics that isolate spectral quality from prosody-induced time drift
    # (free-running mel-L1 also counts every frame a duration error shifts)
    infer_tf = jax.jit(lambda p, ph, sl, pit, en, dur: fs2.apply(
        {"params": p}, ph, sl, MAX_MEL,
        pitch_target=pit, energy_target=en, duration_target=dur))

    d_mae = d_exact = p_mae = e_mae = mel_l1 = mcd = n_ph_total = 0.0
    mel_l1_tf = mcd_tf = mcd_dtw = p_floor = e_floor = 0.0
    n_utt = 0
    sample = None
    for name in dev_names:
        s = np.load(os.path.join(feature_dir, name + ".npy"),
                    allow_pickle=True).item()
        L = len(s["phonemes"])
        ph = np.zeros((1, cfg.data.max_phoneme_len), np.int32)
        ph[0, :L] = s["phonemes"]
        mel, log_d, p_pred, e_pred, mel_len, _ = infer(
            params, jnp.asarray(ph), jnp.asarray([L], jnp.int32))
        d_pred = np.maximum(
            np.round(np.exp(np.asarray(log_d[0, :L], np.float64)) - 1.0), 0)
        d_gt = s["duration"].astype(np.float64)
        d_mae += float(np.abs(d_pred - d_gt).sum())
        d_exact += float((d_pred == d_gt).sum())
        # pitch stored as log1p(Hz): report MAE in Hz
        p_hz_pred = np.expm1(np.asarray(p_pred[0, :L], np.float64))
        p_hz_gt = np.expm1(s["pitch"].astype(np.float64))
        p_mae += float(np.abs(p_hz_pred - p_hz_gt).sum())
        e_mae += float(np.abs(np.asarray(e_pred[0, :L], np.float64)
                              - s["energy"]).sum())
        # irreducible floor: text-only inference can at best predict the
        # per-phone rule MEAN; the target carries the realized jitter
        mean_f0 = np.array([phone_rules(int(p))[1] for p in s["phonemes"]])
        mean_en = np.array([phone_rules(int(p))[2] * 5.0 for p in s["phonemes"]])
        p_floor += float(np.abs(mean_f0 - p_hz_gt).sum())
        e_floor += float(np.abs(mean_en - s["energy"]).sum())
        n_ph_total += L

        t = min(int(mel_len[0]), s["mel"].shape[0], MAX_MEL)
        m_pred = np.asarray(mel[0, :t], np.float64)
        m_gt = s["mel"][:t].astype(np.float64)
        mel_l1 += float(np.abs(m_pred - m_gt).mean())
        mcd += mcd_db(m_pred, m_gt)
        # DTW-aligned MCD on the FULL predicted/gt mels: the free-running
        # spectral metric that doesn't charge duration drift as error
        t_pred = min(int(mel_len[0]), MAX_MEL)
        mcd_dtw += mcd_dtw_db(np.asarray(mel[0, :t_pred], np.float64),
                              s["mel"][:MAX_MEL].astype(np.float64))

        # teacher-forced pass: exact frame alignment
        pit = np.zeros((1, cfg.data.max_phoneme_len), np.float32)
        en = np.zeros((1, cfg.data.max_phoneme_len), np.float32)
        du = np.zeros((1, cfg.data.max_phoneme_len), np.int32)
        pit[0, :L], en[0, :L], du[0, :L] = s["pitch"], s["energy"], s["duration"]
        mel_tf = infer_tf(params, jnp.asarray(ph), jnp.asarray([L], jnp.int32),
                          jnp.asarray(pit), jnp.asarray(en), jnp.asarray(du))[0]
        t_tf = min(int(s["duration"].sum()), s["mel"].shape[0], MAX_MEL)
        m_tf = np.asarray(mel_tf[0, :t_tf], np.float64)
        g_tf = s["mel"][:t_tf].astype(np.float64)
        mel_l1_tf += float(np.abs(m_tf - g_tf).mean())
        mcd_tf += mcd_db(m_tf, g_tf)
        n_utt += 1
        if sample is None:
            sample = (name, np.asarray(mel[0, :t], np.float32),
                      s["mel"][:t], s)

    results = {
        "held_out_utts": n_utt,
        "duration_mae_frames": round(d_mae / n_ph_total, 4),
        "duration_exact_rate": round(d_exact / n_ph_total, 4),
        "pitch_mae_hz": round(p_mae / n_ph_total, 3),
        "pitch_mae_floor_hz": round(p_floor / n_ph_total, 3),
        "energy_mae": round(e_mae / n_ph_total, 4),
        "energy_mae_floor": round(e_floor / n_ph_total, 4),
        "mel_l1": round(mel_l1 / n_utt, 4),
        "mcd13_db": round(mcd / n_utt, 3),
        "mcd13_dtw_db": round(mcd_dtw / n_utt, 3),
        "mel_l1_teacher_forced": round(mel_l1_tf / n_utt, 4),
        "mcd13_db_teacher_forced": round(mcd_tf / n_utt, 3),
    }

    name, m_pred, m_gt, s = sample
    np.save(os.path.join(out_dir, "mel_pred.npy"), m_pred)
    np.save(os.path.join(out_dir, "mel_gt.npy"), m_gt)

    if wavegrad_ckpt:
        results["e2e"] = vocode_e2e(m_pred, wavegrad_ckpt, out_dir)
    return results


def vocode_e2e(fs2_mel, wavegrad_ckpt, out_dir):
    """FS2 mel → WaveGrad audio → re-analyzed mel distance."""
    import jax
    import jax.numpy as jnp

    from mindaudio_tpu.data import io, spectrum
    from mindaudio_tpu.models.wavegrad import (WaveGrad, fast_noise_schedule,
                                               reverse_diffusion)
    from mindaudio_tpu.train.checkpoint import restore_checkpoint

    wg = WaveGrad()
    ckpt = restore_checkpoint(wavegrad_ckpt)
    wg_params = (ckpt["params"]["model"]
                 if "model" in ckpt["params"] else ckpt["params"])

    mel_db = fs2_mel_to_wavegrad(fs2_mel)

    def apply_fn(params, mel_b, audio, scale):
        return wg.apply({"params": params}, mel_b, audio, scale)

    audio = np.asarray(reverse_diffusion(
        wg_params, apply_fn, jnp.asarray(mel_db[None]),
        jax.random.PRNGKey(0), hop=HOP,
        betas=fast_noise_schedule(),
    )[0], np.float32)
    io.write(os.path.join(out_dir, "e2e_sample.wav"), audio, SR)

    def analyze(wav):
        m = spectrum.melspectrogram(
            wav[: len(fs2_mel) * HOP], n_fft=N_FFT, hop_length=HOP,
            win_length=N_FFT, n_mels=N_MELS, sample_rate=SR,
            norm="slaney", mel_type="slaney")
        return np.log(np.maximum(m, 1e-5)).T[: len(fs2_mel)]

    mel_rt = analyze(audio)
    noise = np.random.default_rng(0).standard_normal(
        len(fs2_mel) * HOP).astype(np.float32) * 0.1
    return {
        "mel_l1_roundtrip": round(float(np.abs(mel_rt - fs2_mel).mean()), 4),
        "mel_l1_noise_baseline": round(
            float(np.abs(analyze(noise) - fs2_mel).mean()), 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--utts", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=32)
    # post-LN FFT stacks sit near a cliff at Adam lr 1e-3: one large-ish
    # (clipped!) update can tip the decoder into the constant-output basin,
    # from which 1e-3 cannot retrain it (measured: mel 0.39 -> 2.11 in <50
    # steps at step ~1375, flat thereafter; the torch-lineage Noam schedule
    # decays through this region instead of holding 1e-3 for 5k steps).
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--corpus_dir", default="")
    ap.add_argument("--wavegrad_ckpt", default="",
                    help="trained WaveGrad ckpt dir for the end-to-end leg")
    ap.add_argument("--write_wavs", action="store_true",
                    help="also write corpus wavs (to train a WaveGrad on)")
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--prep_wavegrad", default="",
                    help="write WaveGrad (audio, mel) features for the corpus"
                         " wavs to this dir and exit")
    args = ap.parse_args()

    out_dir = os.path.join(HERE, "convergence")
    os.makedirs(out_dir, exist_ok=True)
    feature_dir = args.corpus_dir or os.path.join(out_dir, "corpus")

    if args.prep_wavegrad:
        prepare_wavegrad_corpus(feature_dir, args.prep_wavegrad)
        return

    if not os.path.exists(os.path.join(feature_dir, "train.txt")):
        print(f"building corpus ({args.utts} utts) ...", flush=True)
        dev_names = build_corpus(feature_dir, args.utts,
                                 write_wavs=args.write_wavs)
    else:
        dev_names = open(os.path.join(feature_dir, "dev.txt")).read().split()

    ckpt_dir = os.path.join(out_dir, "ckpt")
    overrides = [
        "--data.feature_dir", feature_dir,
        "--data.n_mels", str(N_MELS), "--data.hop_length", str(HOP),
        "--data.sample_rate", str(SR),
        "--data.max_phoneme_len", str(MAX_PH),
        "--data.max_mel_len", str(MAX_MEL),
        "--data.batch_size", str(args.batch),
        "--optim.lr", str(args.lr),
        "--optim.epochs", "100000",
        "--train.max_steps", str(args.steps),
        "--train.ckpt_dir", ckpt_dir,
        "--train.save_every_steps", str(max(args.steps // 4, 1)),
        "--train.log_every_steps", "50",
    ]

    import train as fs2_train

    if not args.skip_train:
        # capture the recipe's step logs into a committed loss curve.
        # Pre-warm get_logger FIRST: train.main()'s own get_logger call
        # drops all existing handlers when it (re)configures the logger,
        # which silently discarded the curve handler before this fix.
        import logging
        import re

        from mindaudio_tpu.train.log import get_logger

        get_logger("fastspeech2")
        curve = []

        class _Curve(logging.Handler):
            def emit(self, record):
                m = re.search(
                    r"step (\d+) loss ([\d.]+) \(mel ([\d.]+) dur ([\d.]+) "
                    r"pitch ([\d.]+) energy ([\d.]+)\)", record.getMessage())
                if m:
                    curve.append({
                        "step": int(m.group(1)), "loss": float(m.group(2)),
                        "mel": float(m.group(3)), "dur": float(m.group(4)),
                        "pitch": float(m.group(5)),
                        "energy": float(m.group(6)),
                    })

        handler = _Curve()
        logging.getLogger("fastspeech2").addHandler(handler)
        old_argv = sys.argv
        sys.argv = ["train.py"] + overrides
        try:
            fs2_train.main()
        finally:
            sys.argv = old_argv
            logging.getLogger("fastspeech2").removeHandler(handler)
        with open(os.path.join(out_dir, "loss_curve.json"), "w") as f:
            json.dump(curve, f, indent=1)

    from mindaudio_tpu.train.checkpoint import restore_checkpoint
    from mindaudio_tpu.train.config import get_config

    cfg = get_config(os.path.join(HERE, "fastspeech2.yaml"), overrides)
    ckpt = restore_checkpoint(ckpt_dir)
    params = (ckpt["params"]["model"]
              if "model" in ckpt["params"] else ckpt["params"])

    results = evaluate(cfg, params, dev_names, feature_dir, out_dir,
                       wavegrad_ckpt=args.wavegrad_ckpt)
    results["config"] = {"steps": args.steps, "utts": args.utts,
                         "batch": args.batch, "n_phones": N_PHONES}
    with open(os.path.join(out_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
