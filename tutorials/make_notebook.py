"""Generate the runnable quick-start notebook, executing every cell.

Counterpart of the reference tutorial notebook
(reference tutorials/audio_data_processing_with_mindaudio.ipynb) — same
walk through the data-processing API (io -> features -> filters ->
augment -> processing -> spectrum), extended with the TPU-native device
sections that are this framework's point. Every code cell is executed at
generation time in one shared namespace and its stdout embedded, so the
committed .ipynb carries real outputs; `tests/test_tutorial_notebook.py`
re-executes the cells so the notebook can never rot.

Usage: python tutorials/make_notebook.py  [writes the .ipynb next to it]
"""
import io as _stdio
import json
import os
import sys
from contextlib import redirect_stdout

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))

OUT = os.path.join(HERE, "audio_data_processing_with_mindaudio_tpu.ipynb")

# (kind, text) — code cells are plain source strings
CELLS = [
    ("md", """\
# Audio data processing with mindaudio_tpu — quick start

Runnable counterpart of the reference MindAudio tutorial
(`tutorials/audio_data_processing_with_mindaudio.ipynb`). Every cell runs
as-is on CPU with no external data (audio is synthesized in-notebook); the
device cells run the same code on a TPU chip when one is attached.

The host `mindaudio_tpu.data` layer keeps the reference's function names,
signatures and defaults (NumPy in / NumPy out, re-exported at the package
top level), so reference pipelines port unchanged. The `mindaudio_tpu.ops`
layer is the TPU-native path: the same DSP as jit-compiled / Pallas
kernels that run *inside* your train step.
"""),
    ("md", """\
## 1. API structure

```
mindaudio_tpu
├── data            host DSP (NumPy), reference-compatible names
│   ├── io          read / write (WAV, 1–64-bit, offset/duration seek)
│   ├── spectrum    stft / istft / magphase / mel / dB
│   ├── features    fbank / mfcc / deltas / yin f0 / hpss
│   ├── filters     low_pass / high_pass / notch / peaking / filtfilt …
│   ├── augment     add_noise / add_reverb / speed / drop_chunk / …
│   └── processing  resample / clip / normalize / cmvn / trim / split
├── ops             device DSP (jit + Pallas): fbank, mfcc, fused log-mel,
│                   SpecAugment — runs inside the jitted step
├── models          Conformer, DeepSpeech2, ECAPA-TDNN, TasNet/Conv-TasNet,
│                   FastSpeech2, WaveGrad
└── parallel        mesh / shardings / pipeline / MoE (GSPMD)
```
"""),
    ("md", "## 2. Quick tour\n\n### 2.1 `io`: read / write"),
    ("code", """\
import os, tempfile
import numpy as np
import mindaudio_tpu as ma

workdir = tempfile.mkdtemp(prefix="ma_tutorial_")
sr = 16000
t = np.arange(2 * sr) / sr
wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)

path = os.path.join(workdir, "tone.wav")
ma.write(path, wav, sr)
x, sr = ma.read(path)
print("full read:", x.shape, x.dtype, "sr", sr)

x_seg, _ = ma.read(path, offset=0.25, duration=0.5)   # seek-based slice
print("offset/duration read:", x_seg.shape)
"""),
    ("md", "### 2.2 `features`: fbank / mfcc"),
    ("code", """\
feats = ma.fbank(wav, n_mels=40, sample_rate=sr)
print("fbank:", feats.shape)            # (n_mels, T)

mfccs = ma.mfcc(wav, sample_rate=sr)
print("mfcc:", mfccs.shape)
"""),
    ("md", "### 2.3 `filters`"),
    ("code", """\
lp = ma.low_pass_filter(wav, sr, cutoff_freq=1500)
kernel = ma.notch_filter(2 * 440 / sr)        # freq as fraction of Nyquist
notched = np.convolve(wav, kernel.ravel(), mode="same")
print("low-pass rms: %.4f   notch(440 Hz) rms: %.4f   input rms: %.4f"
      % (np.sqrt((lp**2).mean()), np.sqrt((notched**2).mean()),
         np.sqrt((wav**2).mean())))
# notching the tone's own frequency kills most of its energy
"""),
    ("md", """\
### 2.4 `augment`

`add_noise` / `add_reverb` take lists of wav paths (as the reference does
for its CSV-driven pipelines); here we synthesize a noise file and a small
room impulse response.
"""),
    ("code", """\
rng = np.random.default_rng(0)
noise_path = os.path.join(workdir, "background.wav")
ma.write(noise_path, rng.standard_normal(2 * sr).astype(np.float32) * 0.1, sr)

rir = np.zeros(2000, np.float32)
rir[0] = 1.0
rir[[400, 900, 1500]] = [0.6, 0.3, 0.15]      # a few discrete echoes
rir_path = os.path.join(workdir, "rir.wav")
ma.write(rir_path, rir, sr)

noisy = ma.add_noise(wav[None, :], [noise_path], 10, 20)  # SNR ~ U[10,20] dB
wet = ma.add_reverb(wav[None, :], [rir_path], 1.0)
print("noisy:", noisy.shape, " reverbed:", wet.shape)
"""),
    ("md", "### 2.5 `processing`: resample / clip"),
    ("code", """\
x8k = ma.resample(wav, orig_freq=sr, new_freq=8000)
print("resampled:", x8k.shape)              # half the samples

seg = ma.clip(wav, 0.1, 0.5)                 # fractions of total length
print("clip [0.1, 0.5]:", seg.shape)
"""),
    ("md", "### 2.6 `spectrum`: stft / magphase / istft"),
    ("code", """\
spec = ma.stft(wav)                           # librosa conventions
mag, phase = ma.magphase(spec, power=1.0)
recon = ma.istft(spec)
err = np.abs(recon[: len(wav)] - wav[: len(recon)]).max()
print("stft:", spec.shape, " round-trip max err: %.2e" % err)
"""),
    ("md", """\
## 3. The TPU-native path

On device, feature extraction belongs *inside* the jitted step — no host
round trip, no worker pools. The `ops` functions are the same math as the
host layer, compiled by XLA (and, for the log-mel front-end, a fused
Pallas kernel that does framing + DFT + power + mel + log in one VMEM
pass — the `bench.py` headline at ~74 Mframes/s/chip on v5e).

This cell runs on whatever backend JAX finds (CPU here, TPU on a chip).
"""),
    ("code", """\
import jax, jax.numpy as jnp
from mindaudio_tpu import ops

@jax.jit
def featurize(wavs):                          # (B, L) batch on device
    return ops.fbank(wavs, n_mels=80)

batch = jnp.asarray(np.stack([wav, np.roll(wav, 123)]))
feats_dev = featurize(batch)
print("backend:", jax.default_backend(), " device fbank:", feats_dev.shape)
"""),
    ("md", """\
SpecAugment runs PRNG-keyed inside the step, so augmentation rides under
the matmul shadow instead of stalling the input pipeline:
"""),
    ("code", """\
from mindaudio_tpu.ops import spec_augment

key = jax.random.PRNGKey(0)
spec_b = jnp.moveaxis(feats_dev, -1, -2)      # (B, n_mels, T) -> (B, T, n_mels)
aug = spec_augment(key, spec_b)
print("masked frames:", int((aug.sum(-1) == 0).sum()),
      "masked bins:", int((aug.sum(-2) == 0).sum()))
"""),
    ("md", """\
## 4. From features to a model

The model zoo consumes `(B, T, n_mels)` features. One Conformer encoder
forward:
"""),
    ("code", """\
from mindaudio_tpu.models import ConformerEncoder

enc = ConformerEncoder(input_dim=80, d_model=128, head_num=4,
                       ffn_dim=512, num_layers=2)
x_btf = jnp.moveaxis(feats_dev, -1, -2)       # (B, T, n_mels)
lens = jnp.full((x_btf.shape[0],), x_btf.shape[1], jnp.int32)
params = enc.init(jax.random.PRNGKey(0), x_btf, lens)
out, out_mask = enc.apply(params, x_btf, lens)   # mask: (B, 1, 1, T_out) valid frames
print("encoder out:", out.shape,
      " out lens:", np.asarray(out_mask.sum(axis=-1)).ravel())
"""),
    ("md", """\
## 5. Where to go next

- `examples/<recipe>/README.md` — full train / decode / streaming recipes
  (conformer, deepspeech2, ECAPA-TDNN, tasnet, conv_tasnet, fastspeech2,
  wavegrad), each with committed convergence artifacts.
- `docs/tutorial_audio_processing.md` — this tour in markdown form.
- `MIGRATION.md` — reference-to-here mapping of every entry point.
- `PERF.md` — measured kernels, step times and the methodology behind them.
"""),
]


def main():
    ns = {}
    cells = []
    for kind, text in CELLS:
        if kind == "md":
            cells.append({"cell_type": "markdown", "metadata": {},
                          "source": text.splitlines(keepends=True)})
            continue
        buf = _stdio.StringIO()
        with redirect_stdout(buf):
            exec(compile(text, "<cell>", "exec"), ns)  # noqa: S102
        out = buf.getvalue()
        outputs = []
        if out:
            outputs.append({"output_type": "stream", "name": "stdout",
                            "text": out.splitlines(keepends=True)})
        cells.append({"cell_type": "code", "metadata": {},
                      "execution_count": None, "outputs": outputs,
                      "source": text.splitlines(keepends=True)})
    nb = {
        "nbformat": 4, "nbformat_minor": 5,
        "metadata": {"kernelspec": {"display_name": "Python 3",
                                    "language": "python", "name": "python3"},
                     "language_info": {"name": "python"}},
        "cells": cells,
    }
    with open(OUT, "w") as f:
        json.dump(nb, f, indent=1, ensure_ascii=False)
    print("wrote", OUT, f"({len(cells)} cells)")


if __name__ == "__main__":
    main()
