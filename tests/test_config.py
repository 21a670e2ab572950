import json

from powerpoint_context_extractor_spark.config import DEFAULTS, Config


def test_defaults_and_dot_get(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    c = Config()
    assert c.get("dedup.minhash_threshold_bp") == 8000
    assert c.get("nope.deep.path", 42) == 42


def test_layered_override(tmp_path, monkeypatch):
    p = tmp_path / "pcx_config.json"
    p.write_text(json.dumps({"dedup": {"minhash_threshold_bp": 9500},
                             "custom": {"x": 1}}))
    monkeypatch.chdir(tmp_path)
    c = Config()
    assert c.get("dedup.minhash_threshold_bp") == 9500
    assert c.get("dedup.shingle_k") == 3          # default preserved
    assert c.get("custom.x") == 1
    assert DEFAULTS["dedup"]["minhash_threshold_bp"] == 8000  # untouched


def test_dot_set():
    c = Config()
    c.set("a.b.c", 7)
    assert c.get("a.b.c") == 7
