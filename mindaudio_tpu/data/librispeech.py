"""LibriSpeech dataset preparation (wav/ + txt/ layout + JSON manifest).

Host-only counterpart of reference ``mindaudio/data/librispeech.py``
(``download_data`` :27, ``create_json_dict`` :44, ``prepare_librispeech``
:95). Keeps the reference's output contract — per split a directory with
``wav/``, ``txt/`` and ``libri_<split>_manifest.json`` holding
``{"data_path", "samples": [{"wav_path", "txt_path"}]}`` — so DeepSpeech2
recipe loaders are interchangeable. FLAC transcoding requires ffmpeg/sox and
is left to the caller; already-wav trees are re-laid-out directly.
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import tarfile
from pathlib import Path

logger = logging.getLogger(__name__)

__all__ = ["prepare_librispeech", "LIBRI_SPEECH_URLS"]

LIBRI_SPEECH_URLS = {
    "train": [
        "https://www.openslr.org/resources/12/train-clean-100.tar.gz",
        "https://www.openslr.org/resources/12/train-clean-360.tar.gz",
        "https://www.openslr.org/resources/12/train-other-500.tar.gz",
    ],
    "val": ["https://www.openslr.org/resources/12/dev-clean.tar.gz",
            "https://www.openslr.org/resources/12/dev-other.tar.gz"],
    "test_clean": ["https://www.openslr.org/resources/12/test-clean.tar.gz"],
    "test_other": ["https://www.openslr.org/resources/12/test-other.tar.gz"],
}


def download_data(data_path: str, urls=None):
    import urllib.request

    urls = urls or LIBRI_SPEECH_URLS
    for split, split_urls in urls.items():
        for url in split_urls:
            target = os.path.join(data_path, url.split("/")[-1])
            if not os.path.exists(target):
                logger.info("downloading %s", url)
                urllib.request.urlretrieve(url, target)


def _relayout_tree(extracted_root: str, split_dir: str, manifest: dict):
    """Move <utt>.flac/.wav next to per-utt transcripts into wav/ + txt/."""
    wav_dir = os.path.join(split_dir, "wav")
    txt_dir = os.path.join(split_dir, "txt")
    os.makedirs(wav_dir, exist_ok=True)
    os.makedirs(txt_dir, exist_ok=True)

    for txt_path in sorted(Path(extracted_root).rglob("*.trans.txt")):
        base_dir = txt_path.parent
        with open(txt_path, encoding="utf-8") as f:
            for line in f:
                parts = line.strip().split()
                if not parts:
                    continue
                utt, transcript = parts[0], " ".join(parts[1:])
                with open(os.path.join(txt_dir, utt + ".txt"), "w",
                          encoding="utf-8") as tf:
                    tf.write(transcript)
                for ext in (".wav", ".flac"):
                    src = base_dir / (utt + ext)
                    if src.exists():
                        shutil.move(str(src), os.path.join(wav_dir, utt + ext))
                        manifest["samples"].append({
                            "wav_path": os.path.join("wav", utt + ext),
                            "txt_path": os.path.join("txt", utt + ".txt"),
                        })
                        break


def create_json_dict(data_path: str, urls=None):
    """Extract downloaded tarballs and write per-split manifests."""
    urls = urls or LIBRI_SPEECH_URLS
    for split, split_urls in urls.items():
        split_dir = os.path.join(data_path, split)
        os.makedirs(split_dir, exist_ok=True)
        manifest = {"data_path": split_dir, "samples": []}

        for url in split_urls:
            tarball = os.path.join(data_path, url.split("/")[-1])
            if not os.path.exists(tarball):
                continue
            with tarfile.open(tarball) as tar:
                tar.extractall(data_path)
            extracted = os.path.join(data_path, "LibriSpeech")
            _relayout_tree(extracted, split_dir, manifest)
            shutil.rmtree(extracted, ignore_errors=True)

        out = os.path.join(split_dir, f"libri_{split}_manifest.json")
        Path(out).write_text(json.dumps(manifest), encoding="utf8")
        logger.info("%s: %d samples", out, len(manifest["samples"]))


def prepare_librispeech(data_path: str, download: bool = False, urls=None):
    if download:
        download_data(data_path, urls)
    create_json_dict(data_path, urls)
