"""Regenerate docs/api/*.md from package docstrings.

Usage: JAX_PLATFORMS=cpu python docs/api/generate.py

Each page lists every public name (module ``__all__``, else module-owned
top-level callables) with its signature and first docstring line. Flax
modules show their dataclass fields instead of ``__init__``.
"""

from __future__ import annotations

import dataclasses
import importlib
import inspect
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "../.."))

SECTIONS = {
    "data": ["mindaudio_tpu.data.io", "mindaudio_tpu.data.spectrum",
             "mindaudio_tpu.data.features", "mindaudio_tpu.data.augment",
             "mindaudio_tpu.data.processing", "mindaudio_tpu.data.filters",
             "mindaudio_tpu.data.aishell", "mindaudio_tpu.data.librispeech",
             "mindaudio_tpu.data.voxceleb", "mindaudio_tpu.data.librimix",
             "mindaudio_tpu.data.textgrid"],
    "ops": ["mindaudio_tpu.ops.spectral", "mindaudio_tpu.ops.filterbanks",
            "mindaudio_tpu.ops.specaugment", "mindaudio_tpu.ops.pallas_mel",
            "mindaudio_tpu.ops.quant"],
    "models": ["mindaudio_tpu.models.conformer", "mindaudio_tpu.models.layers",
               "mindaudio_tpu.models.asr_model",
               "mindaudio_tpu.models.deepspeech2",
               "mindaudio_tpu.models.ecapa_tdnn",
               "mindaudio_tpu.models.conv_tasnet", "mindaudio_tpu.models.tasnet",
               "mindaudio_tpu.models.fastspeech2", "mindaudio_tpu.models.wavegrad",
               "mindaudio_tpu.models.greedy_decoder"],
    "loss": ["mindaudio_tpu.loss.ctc_loss",
             "mindaudio_tpu.loss.label_smoothing_loss",
             "mindaudio_tpu.loss.separation_loss",
             "mindaudio_tpu.loss.aam_softmax",
             "mindaudio_tpu.loss.fastspeech2_loss"],
    "metric": ["mindaudio_tpu.metric.wer", "mindaudio_tpu.metric.snr",
               "mindaudio_tpu.metric.eer"],
    "scheduler": ["mindaudio_tpu.scheduler.schedules"],
    "train": ["mindaudio_tpu.train.state", "mindaudio_tpu.train.checkpoint",
              "mindaudio_tpu.train.config", "mindaudio_tpu.train.log",
              "mindaudio_tpu.train.profiler", "mindaudio_tpu.train.prefetch"],
    "parallel": ["mindaudio_tpu.parallel.mesh",
                 "mindaudio_tpu.parallel.shardings",
                 "mindaudio_tpu.parallel.ring_attention"],
    "utils": ["mindaudio_tpu.utils.common", "mindaudio_tpu.utils.mask",
              "mindaudio_tpu.utils.recognize", "mindaudio_tpu.utils.tokenizer",
              "mindaudio_tpu.utils.cmvn"],
}

MAX_SIG = 400


def _signature(name, obj):
    if inspect.isclass(obj):
        if dataclasses.is_dataclass(obj):
            fields = ", ".join(f.name for f in dataclasses.fields(obj)
                               if f.name not in ("parent", "name"))
            return f"({fields})", True
        sig = str(inspect.signature(obj.__init__))
        return sig.replace("(self, ", "(").replace("(self)", "()"), True
    if callable(obj):
        return str(inspect.signature(obj)), False
    return None, False


def main():
    for section, mods in SECTIONS.items():
        lines = [f"# `mindaudio_tpu.{section}` API reference", ""]
        for mname in mods:
            try:
                m = importlib.import_module(mname)
            except Exception as e:  # keep generating the rest
                print("SKIP", mname, e)
                continue
            mdoc = (inspect.getdoc(m) or "").strip().split("\n")[0]
            lines += [f"## `{mname}`", "", mdoc, ""]
            names = getattr(m, "__all__", None) or [
                n for n, o in vars(m).items()
                if not n.startswith("_")
                and getattr(o, "__module__", None) == mname
            ]
            for n in names:
                o = getattr(m, n, None)
                if o is None:
                    continue
                doc = (inspect.getdoc(o) or "").strip().split("\n")[0]
                try:
                    sig, is_cls = _signature(n, o)
                except (ValueError, TypeError):
                    sig, is_cls = None, False
                if sig is None:
                    lines.append(f"- **`{n}`** — {doc}")
                    continue
                if len(sig) > MAX_SIG:  # huge literal defaults: elide the
                    # whole default expression (greedy to its closing paren)
                    sig = re.sub(r"=\(.*\)(?=\))", "=<default rules>",
                                 sig, flags=re.S)
                kind = "class " if is_cls else ""
                lines.append(f"- **{kind}`{n}{sig}`** — {doc}")
            lines.append("")
        out = os.path.join(HERE, f"{section}.md")
        with open(out, "w") as f:
            f.write("\n".join(lines))
        print("wrote", out)


if __name__ == "__main__":
    main()
