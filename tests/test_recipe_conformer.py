"""Conformer recipe integration test: prepare → cmvn → 2 sharded train steps
→ greedy decode, on generated data (guards the end-to-end pipeline the unit
tests can't)."""

import os
import sys

import numpy as np
import pytest

RECIPE = os.path.join(os.path.dirname(__file__), "..", "examples", "conformer")


@pytest.fixture(scope="module")
def aishell_tree(tmp_path_factory):
    import mindaudio_tpu as ma

    root = tmp_path_factory.mktemp("aishell")
    tdir = root / "data_aishell" / "transcript"
    tdir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    words = "你好世界语音识别"
    lines = []
    sr = 16000
    for split, n in (("train", 16), ("dev", 8), ("test", 8)):
        for i in range(n):
            utt = f"BAC{split}{i:04d}"
            wav = root / "data_aishell" / "wav" / split / "S0001" / f"{utt}.wav"
            wav.parent.mkdir(parents=True, exist_ok=True)
            dur = rng.uniform(0.8, 1.5)
            t = np.arange(int(sr * dur)) / sr
            f0 = 150 + 60 * np.sin(2 * np.pi * rng.uniform(1, 3) * t)
            x = 0.4 * np.sin(2 * np.pi * np.cumsum(f0) / sr)
            x += 0.05 * rng.standard_normal(len(t))
            ma.write(str(wav), x.astype(np.float32), sr)
            text = "".join(rng.choice(list(words), size=rng.integers(3, 7)))
            lines.append(f"{utt} {' '.join(text)}")
    with open(tdir / "aishell_transcript_v0.8.txt", "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
    ma.prepare_aishell(str(root))
    return root


def _args(root, ckpt_dir):
    return [
        "--data.train_csv", f"{root}/train.csv",
        "--data.dev_csv", f"{root}/dev.csv",
        "--data.test_csv", f"{root}/test.csv",
        "--data.vocab_file", f"{root}/lang_char.txt",
        "--data.cmvn_file", f"{root}/global_cmvn.json",
        "--data.batch_factor", "0.1", "--data.speed_perturb", "false",
        "--model.d_model", "32", "--model.head_num", "2",
        "--model.ffn_dim", "64", "--model.num_encoder_layers", "1",
        "--model.num_decoder_layers", "1",
        "--optim.epochs", "1", "--optim.warmup_steps", "10",
        "--train.max_steps", "2", "--train.log_every_steps", "1",
        "--train.save_every_steps", "2", "--train.ckpt_dir", str(ckpt_dir),
        "--decode.average_num", "1", "--decode.beam_size", "3",
        "--decode.max_tgt_len", "8", "--decode.mode", "ctc_greedy",
    ]


class TestConformerRecipe:
    def test_train_then_predict(self, aishell_tree, tmp_path, capsys):
        sys.path.insert(0, RECIPE)
        old_cwd = os.getcwd()
        os.chdir(RECIPE)
        old_argv = sys.argv
        try:
            ckpt_dir = tmp_path / "ckpt"
            args = _args(aishell_tree, ckpt_dir)

            sys.argv = ["compute_cmvn_stats.py"] + args
            import compute_cmvn_stats

            compute_cmvn_stats.main()
            assert os.path.exists(f"{aishell_tree}/global_cmvn.json")

            sys.argv = ["train.py"] + args
            import train as conformer_train

            conformer_train.main()
            from mindaudio_tpu.train.checkpoint import list_steps

            assert list_steps(str(ckpt_dir))

            sys.argv = ["predict.py"] + args + [
                "--decode.result_file", str(tmp_path / "result.txt")]
            import predict

            predict.main()
            out = capsys.readouterr().out
            assert "CER=" in out
        finally:
            os.chdir(old_cwd)
            sys.argv = old_argv
            sys.path.remove(RECIPE)
            # recipe modules use generic names; a later recipe test importing
            # its own train.py must not get these cached ones
            for mod in ("train", "predict", "compute_cmvn_stats", "dataset"):
                sys.modules.pop(mod, None)

    def _train_variant(self, aishell_tree, tmp_path, extra_args):
        """Run train.py with extra flags; returns nothing, asserts a ckpt."""
        sys.path.insert(0, RECIPE)
        old_cwd = os.getcwd()
        os.chdir(RECIPE)
        old_argv = sys.argv
        try:
            ckpt_dir = tmp_path / "ckpt"
            args = _args(aishell_tree, ckpt_dir) + extra_args
            sys.argv = ["train.py"] + args
            import train as conformer_train

            conformer_train.main()
            from mindaudio_tpu.train.checkpoint import list_steps

            assert list_steps(str(ckpt_dir))
        finally:
            os.chdir(old_cwd)
            sys.argv = old_argv
            sys.path.remove(RECIPE)
            for mod in ("train", "predict", "compute_cmvn_stats", "dataset"):
                sys.modules.pop(mod, None)

    def test_train_moe(self, aishell_tree, tmp_path):
        """MoE-Conformer (E=4 top-2, EP over 'model') through the recipe:
        the moe_experts YAML knob, router aux loss added by make_step."""
        self._train_variant(aishell_tree, tmp_path, [
            "--model.moe_experts", "4", "--model.moe_top_k", "2",
            "--train.mesh_model_axis", "4",
        ])

    def test_train_pipeline_zero1(self, aishell_tree, tmp_path):
        """GPipe PP of the encoder blocks (pipe=2) x DP(4), with ZeRO-1
        optimizer sharding on, through the recipe."""
        self._train_variant(aishell_tree, tmp_path, [
            "--model.num_encoder_layers", "4",
            "--train.pipeline_stages", "4",
            "--train.pipeline_microbatches", "2",
            "--train.zero1_optimizer", "true",
        ])
