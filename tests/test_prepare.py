"""Dataset-prep tests on synthetic directory trees (the reference never tests
its prep scripts; these lock the manifest schemas)."""

import csv
import json
import os

import numpy as np
import pytest

from mindaudio_tpu.data import io


def _make_wav(path, seconds=1.0, sr=16000, seed=0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal(int(seconds * sr)) * 0.1).astype(np.float32)
    io.write(path, x, sr)


class TestAishellPrep:
    def test_csv_schema(self, tmp_path):
        from mindaudio_tpu.data.aishell import prepare_aishell

        root = tmp_path / "aishell"
        tdir = root / "data_aishell" / "transcript"
        tdir.mkdir(parents=True)
        utts = {}
        for split in ("train", "dev", "test"):
            for i in range(2):
                utt = f"BAC009S{split[:2].upper()}{i:04d}"
                wav = root / "data_aishell" / "wav" / split / f"S{i:04d}" / f"{utt}.wav"
                _make_wav(str(wav), seconds=0.5, seed=i)
                utts[utt] = f"你好 世界 {split} {i}"
        with open(tdir / "aishell_transcript_v0.8.txt", "w", encoding="utf-8") as f:
            for k, v in utts.items():
                f.write(f"{k} {v}\n")

        prepare_aishell(str(root))
        for split in ("train", "dev", "test"):
            with open(root / f"{split}.csv", encoding="utf-8") as f:
                rows = list(csv.reader(f))
            assert rows[0] == ["ID", "duration", "wav", "transcript"]
            assert len(rows) == 3
            assert abs(float(rows[1][1]) - 0.5) < 1e-6
            assert os.path.exists(rows[1][2])


class TestLibrispeechPrep:
    def test_manifest(self, tmp_path):
        from mindaudio_tpu.data.librispeech import create_json_dict

        root = tmp_path / "libri"
        # fake an extracted LibriSpeech chapter: trans file + flac-named wavs
        chap = root / "LibriSpeech" / "test-clean" / "19" / "198"
        chap.mkdir(parents=True)
        with open(chap / "19-198.trans.txt", "w") as f:
            f.write("19-198-0000 HELLO WORLD\n19-198-0001 GOOD MORNING\n")
        for utt in ("19-198-0000", "19-198-0001"):
            _make_wav(str(chap / f"{utt}.wav"), seconds=0.25)

        # drive the re-layout path directly (no tarball in the test)
        from mindaudio_tpu.data.librispeech import _relayout_tree

        split_dir = root / "test_clean"
        split_dir.mkdir(parents=True)
        manifest = {"data_path": str(split_dir), "samples": []}
        _relayout_tree(str(root / "LibriSpeech"), str(split_dir), manifest)
        out = split_dir / "libri_test_clean_manifest.json"
        out.write_text(json.dumps(manifest))

        data = json.loads(out.read_text())
        assert len(data["samples"]) == 2
        s = data["samples"][0]
        assert os.path.exists(split_dir / s["wav_path"])
        assert open(split_dir / s["txt_path"]).read() in ("HELLO WORLD", "GOOD MORNING")


class TestVoxcelebPrep:
    def test_csvs(self, tmp_path):
        from mindaudio_tpu.data.voxceleb import prepare_voxceleb

        root = tmp_path / "vox"
        spk_utts = []
        for spk in ("id10001", "id10002", "id10003"):
            for sess in ("a", "b"):
                rel = f"{spk}/{sess}/00001.wav"
                _make_wav(str(root / "wav" / rel), seconds=7.0, seed=hash(rel) % 100)
                spk_utts.append(rel)
        # id10003 is the verification-test speaker
        pairs = tmp_path / "veri_test.txt"
        with open(pairs, "w") as f:
            f.write("1 id10003/a/00001.wav id10003/b/00001.wav\n")
            f.write("0 id10003/a/00001.wav id10003/a/00001.wav\n")

        save = tmp_path / "save"
        prepare_voxceleb(str(root), str(save), str(pairs),
                         split_ratio=(50, 50), seg_dur=3.0, amp_th=0.0)

        with open(save / "train.csv") as f:
            train = list(csv.reader(f))
        assert train[0] == ["ID", "duration", "wav", "start", "stop", "spk_id"]
        spks = {r[5] for r in train[1:]}
        assert "id10003" not in spks  # test speaker excluded
        # 7s utterances at 3s chunks -> 2 chunks each
        one_wav_rows = [r for r in train[1:] if r[2] == train[1][2]]
        assert len(one_wav_rows) == 2
        assert int(one_wav_rows[0][4]) - int(one_wav_rows[0][3]) == 3 * 16000

        with open(save / "test.csv") as f:
            test = list(csv.reader(f))
        assert {r[5] for r in test[1:]} == {"id10003"}
