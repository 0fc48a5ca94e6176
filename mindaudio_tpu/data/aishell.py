"""AISHELL-1 dataset preparation (manifest CSVs).

Host-only counterpart of reference ``mindaudio/data/aishell.py``
(``download_aishell`` :17, ``save_aishell_info`` :41, ``prepare_aishell``
:104). Produces the same ``ID,duration,wav,transcript`` CSV schema per split
so recipe dataloaders are interchangeable. Downloads use urllib (the
reference uses wget) and are optional — pass ``download=True`` only on
networked hosts.
"""

from __future__ import annotations

import csv
import glob
import logging
import os
import shutil

from . import io

logger = logging.getLogger(__name__)

__all__ = ["prepare_aishell"]

AISHELL_URL = "https://www.openslr.org/resources/33/data_aishell.tgz"
SPLITS = ("train", "dev", "test")


def download_aishell(data_folder: str):
    """Fetch + extract openslr-33 unless already laid out."""
    wav_root = os.path.join(data_folder, "data_aishell", "wav")
    if os.path.isdir(wav_root):
        return
    tgz = os.path.join(data_folder, "data_aishell.tgz")
    if not os.path.exists(tgz):
        import urllib.request

        logger.info("downloading %s", AISHELL_URL)
        urllib.request.urlretrieve(AISHELL_URL, tgz)
    logger.info("extracting %s", tgz)
    shutil.unpack_archive(tgz, data_folder)
    for inner in glob.glob(os.path.join(wav_root, "*.tar.gz")):
        shutil.unpack_archive(inner, wav_root)
        os.remove(inner)


def load_transcripts(data_folder: str) -> dict:
    """utt-id -> transcript from aishell_transcript_v0.8.txt."""
    path = os.path.join(
        data_folder, "data_aishell", "transcript", "aishell_transcript_v0.8.txt"
    )
    table = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if parts:
                table[parts[0]] = " ".join(parts[1:])
    return table


def save_aishell_info(data_folder: str, save_folder: str):
    """Write {train,dev,test}.csv with ``ID,duration,wav,transcript`` rows."""
    transcripts = load_transcripts(data_folder)
    os.makedirs(save_folder, exist_ok=True)

    id_start = 0
    for split in SPLITS:
        out_csv = os.path.join(save_folder, f"{split}.csv")
        wavs = sorted(glob.glob(
            os.path.join(data_folder, "data_aishell", "wav", split, "*", "*.wav")
        ))
        if os.path.exists(out_csv):
            # resume: skip the write but keep advancing id_start, so a
            # regenerated later split gets IDs disjoint from earlier ones
            id_start += len(wavs)
            continue
        rows = []
        for i, wav in enumerate(wavs):
            utt = os.path.splitext(os.path.basename(wav))[0]
            if utt not in transcripts:
                continue
            signal, sr = io.read(wav)
            rows.append([id_start + i, str(signal.shape[0] / sr), wav,
                         transcripts[utt]])
        with open(out_csv, "w", newline="", encoding="utf-8") as f:
            w = csv.writer(f)
            w.writerow(["ID", "duration", "wav", "transcript"])
            w.writerows(rows)
        logger.info("%s: %d utterances", out_csv, len(rows))
        id_start += len(wavs)


def prepare_aishell(data_path: str, download: bool = False,
                    save_folder: str | None = None):
    if download:
        download_aishell(data_path)
    save_aishell_info(data_path, save_folder or data_path)
