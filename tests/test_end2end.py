"""End-to-end example CLI tests, replicating the reference's strategy
(`src/CI_test/tests/test_end2end.py`): load `examples/end2end.py` by file
path, fake `soundfile` in sys.modules, drive main() with patched argv, and
assert on stdout + the fake's recorded calls. Runs the real synthetic
pipeline (tiny models) — no weights, CPU-only."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest


def _load_end2end_module():
    path = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "examples", "end2end.py")
    )
    spec = importlib.util.spec_from_file_location("_end2end_module", path)
    module = importlib.util.module_from_spec(spec)
    assert spec is not None and spec.loader is not None
    spec.loader.exec_module(module)
    return module


@pytest.fixture
def fake_soundfile(monkeypatch):
    calls = []

    def _write(path, array, samplerate):
        calls.append((path, np.asarray(array).shape, samplerate))

    monkeypatch.setitem(
        sys.modules, "soundfile", types.SimpleNamespace(write=_write)
    )
    return calls


def test_text_branch(monkeypatch, capsys, fake_soundfile):
    monkeypatch.setattr(
        sys, "argv",
        ["prog", "--model", "synthetic", "--synthetic", "--prompts", "hello",
         "--max-tokens", "4"],
    )
    _load_end2end_module().main()
    out = capsys.readouterr().out
    assert "Request ID:" in out
    assert "Text Output:" in out
    assert len(fake_soundfile) == 0  # text branch writes no audio


def test_audio_branch(tmp_path, monkeypatch, capsys, fake_soundfile):
    out_dir = tmp_path / "wav"
    monkeypatch.setattr(
        sys, "argv",
        ["prog", "--model", "synthetic", "--synthetic", "--prompts", "hi",
         "--max-tokens", "4", "--do-wave", "--output-wav", str(out_dir)],
    )
    _load_end2end_module().main()
    out = capsys.readouterr().out
    assert "Saved audio to" in out
    assert len(fake_soundfile) == 1
    path, shape, sr = fake_soundfile[0]
    assert path.endswith(".wav")
    assert sr == 24000
    assert len(shape) == 1 and shape[0] > 0


def test_audio_branch_stdlib_wave_fallback(tmp_path, monkeypatch, capsys):
    """Without soundfile importable, the example writes a real PCM wav."""
    import builtins

    real_import = builtins.__import__

    def no_soundfile(name, *a, **kw):
        if name == "soundfile":
            raise ImportError(name)
        return real_import(name, *a, **kw)

    monkeypatch.delitem(sys.modules, "soundfile", raising=False)
    monkeypatch.setattr(builtins, "__import__", no_soundfile)
    out_dir = tmp_path / "wav"
    monkeypatch.setattr(
        sys, "argv",
        ["prog", "--model", "synthetic", "--synthetic", "--prompts", "yo",
         "--max-tokens", "2", "--do-wave", "--output-wav", str(out_dir)],
    )
    _load_end2end_module().main()
    assert "Saved audio to" in capsys.readouterr().out
    import wave

    files = list(out_dir.iterdir())
    assert len(files) == 1 and files[0].suffix == ".wav"
    with wave.open(str(files[0]), "rb") as f:
        assert f.getframerate() == 24000
        assert f.getnframes() > 0
