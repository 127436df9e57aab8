"""scripts/tpu_health.py stage runner: verdicts for pass / raise / hang."""
import importlib.util
import time
from os import path


def _load():
    p = path.join(path.dirname(__file__), "..", "scripts", "tpu_health.py")
    spec = importlib.util.spec_from_file_location("tpu_health", p)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_stage_pass(capsys):
    mod = _load()
    assert mod.stage("ok", lambda: 42, timeout=5)
    assert "ok   ok" in capsys.readouterr().out


def test_stage_exception(capsys):
    mod = _load()
    assert not mod.stage("boom", lambda: 1 / 0, timeout=5)
    assert "ZeroDivisionError" in capsys.readouterr().err


def test_stage_hang(capsys):
    mod = _load()
    t0 = time.time()
    assert not mod.stage("hang", lambda: time.sleep(60), timeout=0.2)
    assert time.time() - t0 < 5
    assert "hung" in capsys.readouterr().err
