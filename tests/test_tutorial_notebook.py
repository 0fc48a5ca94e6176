"""The tutorial notebook's code cells must always run.

Executes every code cell of
``tutorials/audio_data_processing_with_mindaudio_tpu.ipynb`` in order in
one shared namespace (exactly how ``tutorials/make_notebook.py`` generated
it), so the committed notebook can never rot relative to the API. Parity:
the reference ships the runnable tutorial
``tutorials/audio_data_processing_with_mindaudio.ipynb``.
"""
import json
import os

import pytest

NB = os.path.join(os.path.dirname(__file__), "..", "tutorials",
                  "audio_data_processing_with_mindaudio_tpu.ipynb")


def test_notebook_cells_execute():
    with open(NB) as f:
        nb = json.load(f)
    code = ["".join(c["source"]) for c in nb["cells"]
            if c["cell_type"] == "code"]
    assert len(code) >= 8, "tutorial lost its code cells"
    ns = {}
    for i, src in enumerate(code):
        try:
            exec(compile(src, f"<nb cell {i}>", "exec"), ns)  # noqa: S102
        except Exception as e:  # pragma: no cover
            pytest.fail(f"notebook cell {i} raised {type(e).__name__}: {e}\n"
                        f"--- cell source ---\n{src}")
