"""Queue adoption advisor (experiments/adopt_from_queue.py) parsing,
decision, and apply logic — pure-text, no jax."""

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from experiments.adopt_from_queue import (  # noqa: E402
    MARGIN, bench_headline, decide, main, parse)
from neuralstyletransferv1_tpu import adopt_overrides  # noqa: E402

SAMPLE = """norm=bn sites: ['c2', 'd1']
quality pal-i8: MAE 0.00300 max 0.0900
quality s8c+ds8: MAE 0.00310 max 0.0910
[bf16   B16] 98.0 ms/batch  163.2 fps
[pal-i8 B16] 88.0 ms/batch  181.8 fps
[s8c+ds8 B16] 80.0 ms/batch  200.0 fps
[pal-i8 B48] 262.0 ms/batch  183.2 fps
"""


def test_parse_rows_quality_and_bf16(tmp_path):
    p = tmp_path / "mk32_t7_bn.txt"
    p.write_text(SAMPLE)
    rows, qual, bf16 = parse(p)
    assert rows[("pal-i8", 16)] == 181.8
    assert rows[("pal-i8", 48)] == 183.2
    assert rows[("s8c+ds8", 16)] == 200.0
    assert bf16 == {16: 163.2}
    assert qual["s8c+ds8"] == 0.0031


def test_main_recommends_only_real_wins(tmp_path, capsys):
    (tmp_path / "mk32_t7_bn.txt").write_text(SAMPLE)
    # a harness whose variant is within noise must NOT be recommended
    (tmp_path / "mk33_nst.txt").write_text(
        "quality pal+dec: MAE 0.00100 max 0.01\n"
        "[pal-i8 B16] 100.0 ms/batch  160.0 fps\n"
        "[pal+dec B16] 99.5 ms/batch  160.8 fps\n")
    assert main(str(tmp_path)) == 0
    out = capsys.readouterr().out
    assert "ADOPT" in out and "res_s8 + dec_s8" in out
    assert "[no-win" in out          # the 0.5% mk33 row stays unadopted
    assert 160.8 / 160.0 < MARGIN    # sanity: the fixture is inside noise


def _rows(name_fps: dict[str, float], b: int = 16) -> str:
    return "".join(f"[{n} B{b}] 100.0 ms/batch  {v:.1f} fps\n"
                   for n, v in name_fps.items())


def test_decide_picks_best_winning_variant(tmp_path):
    # s8c+ds8 (+10%) beats pal+dec (+4%); both clear the margin. The BN
    # file targets the split _I8_FUSED_T7_BN constant.
    (tmp_path / "mk32_t7_bn.txt").write_text(
        _rows({"pal-i8": 180.0, "pal+dec": 187.5, "s8c+ds8": 198.0}))
    _, config, _ = decide(str(tmp_path))
    assert config["t7_bn"] == ["res_i8", "res_s8", "dec_s8"]


def test_decide_t7_split_bn_in_are_independent(tmp_path):
    # BN's xla-i8 win must not be vetoed by the IN sibling (separate
    # targets since the mk32 2026-08-19 measurement), and IN's dec_i8
    # win lands on its own constant.
    (tmp_path / "mk32_t7_bn.txt").write_text(
        _rows({"pal-i8": 180.0, "xla-i8": 198.0, "pal+dec": 179.0}))
    (tmp_path / "mk32_t7_in.txt").write_text(
        _rows({"pal-i8": 100.0, "xla-i8": 100.2, "pal+dec": 106.0}))
    _, config, _ = decide(str(tmp_path))
    assert config["t7_bn"] == []          # xla_only -> empty fused set
    assert config["t7"] == ["res_i8", "dec_i8"]


def test_decide_sibling_veto_drops_shared_token(tmp_path):
    # reco IN adopts dec_i8; the FRN sibling ran the dec rows without a
    # win -> dec_i8 is vetoed (shared _I8_FUSED_RECO tuple).
    (tmp_path / "mk34_reco_in.txt").write_text(
        _rows({"pal-i8": 50.0, "pal+dec": 55.0}))
    (tmp_path / "mk34_reco_frn.txt").write_text(
        _rows({"pal-i8": 50.0, "pal+dec": 50.2}))
    lines, config, _ = decide(str(tmp_path))
    assert config is None or "reco" not in config
    assert any("(veto) dec_i8" in ln for ln in lines)


def test_decide_mask_exempts_dec_i8_under_dec_s8(tmp_path, monkeypatch):
    # File A chooses a dec_s8 carry (dec_i8 masked there); file B's dec_i8
    # win must still land — no veto from A. Synthetic spec: the current
    # tables have no shared-target pair where a ds8 row omits dec_i8.
    import experiments.adopt_from_queue as afq
    monkeypatch.setattr(afq, "FILES", {
        "fa": dict(target="reco", base="pal-i8",
                   rows={"s8c+ds8": frozenset({"res_s8", "dec_s8"}),
                         "pal+dec": frozenset({"dec_i8"})}),
        "fb": dict(target="reco", base="pal-i8",
                   rows={"pal+dec": frozenset({"dec_i8"})}),
    })
    (tmp_path / "fa.txt").write_text(
        _rows({"pal-i8": 180.0, "pal+dec": 179.0, "s8c+ds8": 198.0}))
    (tmp_path / "fb.txt").write_text(
        _rows({"pal-i8": 100.0, "pal+dec": 106.0}))
    _, config, _ = decide(str(tmp_path))
    assert config["reco"] == ["res_i8", "res_s8", "dec_s8", "dec_i8"]


def test_decide_quality_gate_blocks_adoption(tmp_path):
    (tmp_path / "mk33_nst.txt").write_text(
        "quality pal+dec: MAE 0.30000 max 1.0\n"
        + _rows({"pal-i8": 100.0, "pal+dec": 120.0}))
    lines, config, _ = decide(str(tmp_path))
    assert config is None
    assert any("quality-fail" in ln for ln in lines)


def test_decide_cross_file_pair_d2(tmp_path):
    (tmp_path / "mk24_head.txt").write_text(
        _rows({"i8-pal+dec": 120.0, "i8-pal+head": 121.0}))
    (tmp_path / "mk24_paird2_on.txt").write_text(
        "quality pallas+dec: MAE 0.00010 max 0.001\n"
        + _rows({"i8-pal+dec": 126.0}))
    _, config, _ = decide(str(tmp_path))
    assert config == {"pair_d2": True}  # head_i8 at +0.8% stays out


def test_decide_multi_batch_requires_win_on_every_batch(tmp_path):
    (tmp_path / "mk33_nst.txt").write_text(
        _rows({"pal-i8": 100.0, "pal+dec": 110.0}, b=16)
        + _rows({"pal-i8": 100.0, "pal+dec": 100.5}, b=48))
    _, config, _ = decide(str(tmp_path))
    assert config is None


def test_decide_static_s8c_adoption(tmp_path):
    (tmp_path / "mk35_static.txt").write_text(
        "quality i8-s8c: MAE 0.00020 max 0.002 (indep MAE 0.00100)\n"
        + _rows({"i8-static": 130.0, "i8-s8c": 141.0}))
    _, config, _ = decide(str(tmp_path))
    assert config == {"sites_static": ["res_i8", "res_s8", "dec_i8"]}


def test_decide_static_head_adoption(tmp_path):
    """The mk35 i8-s8c+head row flips sites_static to the full-Pallas set
    (head_i8 + s8 carries) when it is the best gated winner."""
    (tmp_path / "mk35_static.txt").write_text(
        "quality i8-s8c+head: MAE 0.00030 max 0.003 (indep MAE 0.00200)\n"
        + _rows({"i8-static": 130.0, "i8-s8c": 141.0, "i8-s8c+head": 150.0}))
    _, config, _ = decide(str(tmp_path))
    assert config == {"sites_static": ["res_i8", "res_s8", "dec_s8",
                                      "dec_i8", "head_i8"]}


def test_decide_backend_s8c_rows(tmp_path):
    """mk33/mk34 i8-s8c rows flip the *_static sets to the s8-carry
    chains; the ds8 variant carries dec_s8 too."""
    (tmp_path / "mk33_nst.txt").write_text(
        "quality i8-s8c+ds8: MAE 0.00040 max 0.004\n"
        + _rows({"pal-i8": 100.0, "i8-static": 120.0,
                 "i8-s8c": 126.0, "i8-s8c+ds8": 130.0}))
    (tmp_path / "mk34_reco_in.txt").write_text(
        "quality i8-s8c: MAE 0.00050 max 0.005\n"
        + _rows({"pal-i8": 50.0, "i8-static": 60.0, "i8-s8c": 63.0}))
    _, config, _ = decide(str(tmp_path))
    assert config == {
        "nst_static": ["res_i8", "res_s8", "dec_s8", "dec_i8"],
        "reco_static": ["res_i8", "res_s8"]}


def test_decide_backend_static_rows_target_static_sets(tmp_path):
    """One mk33/mk34 file feeds two targets: dynamic rows -> nst/reco,
    static rows -> nst_static/reco_static. A dec win on the static base
    must flip only the static set (and vice versa)."""
    (tmp_path / "mk33_nst.txt").write_text(
        _rows({"pal-i8": 100.0, "pal+dec": 100.5,
               "i8-static": 120.0, "i8-static+dec": 127.0}))
    (tmp_path / "mk34_reco_in.txt").write_text(
        _rows({"pal-i8": 50.0, "pal+dec": 53.0,
               "i8-static": 60.0, "i8-static+dec": 60.2}))
    _, config, _ = decide(str(tmp_path))
    assert config == {"nst_static": ["res_i8", "dec_i8"],
                      "reco": ["res_i8", "dec_i8"]}


def test_apply_writes_json_and_loader_rides_it(tmp_path, monkeypatch, capsys):
    (tmp_path / "mk32_t7_bn.txt").write_text(SAMPLE)
    monkeypatch.setattr(adopt_overrides, "PATH", tmp_path / "i8_adopt.json")
    try:
        assert main(str(tmp_path), apply=True) == 0
        data = json.loads((tmp_path / "i8_adopt.json").read_text())
        assert data["t7_bn"] == ["res_i8", "res_s8", "dec_s8"]
        adopt_overrides.reload()
        assert adopt_overrides.sites("t7_bn") == ("res_i8", "res_s8",
                                                  "dec_s8")
        assert adopt_overrides.sites("sites") == ("res_i8", "dec_i8")  # default
        # flag precedence: env var beats the json
        (tmp_path / "i8_adopt.json").write_text(json.dumps({"pair_d2": True}))
        adopt_overrides.reload()
        assert adopt_overrides.flag("pair_d2", env="PAIR_D2") is True
        monkeypatch.setenv("PAIR_D2", "0")
        assert adopt_overrides.flag("pair_d2", env="PAIR_D2") is False
    finally:
        monkeypatch.undo()
        adopt_overrides.reload()


def test_apply_keeps_prior_adoption_when_harness_not_run(tmp_path,
                                                         monkeypatch,
                                                         capsys):
    """A truncated window (harness produced no rows) must NOT silently
    revert a previously measured adoption for that target."""
    monkeypatch.setattr(adopt_overrides, "PATH", tmp_path / "i8_adopt.json")
    (tmp_path / "i8_adopt.json").write_text(json.dumps(
        {"sites_static": ["res_i8", "res_s8", "dec_i8"]}))
    # this window only ran mk32_t7_bn; mk35 (sites_static) did not run
    (tmp_path / "mk32_t7_bn.txt").write_text(SAMPLE)
    try:
        assert main(str(tmp_path), apply=True) == 0
        data = json.loads((tmp_path / "i8_adopt.json").read_text())
        assert data["t7_bn"] == ["res_i8", "res_s8", "dec_s8"]
        assert data["sites_static"] == ["res_i8", "res_s8", "dec_i8"]
        assert "kept" in capsys.readouterr().out
    finally:
        monkeypatch.undo()
        adopt_overrides.reload()


def test_apply_no_change_writes_nothing(tmp_path, monkeypatch, capsys):
    (tmp_path / "mk33_nst.txt").write_text(
        _rows({"pal-i8": 100.0, "pal+dec": 100.5}))
    monkeypatch.setattr(adopt_overrides, "PATH", tmp_path / "i8_adopt.json")
    assert main(str(tmp_path), apply=True) == 0
    assert not (tmp_path / "i8_adopt.json").exists()
    assert "defaults stand" in capsys.readouterr().out


def test_bench_headline_parses_last_metric_line(tmp_path):
    p = tmp_path / "bench.txt"
    p.write_text('noise\n{"metric": "x", "value": 115.3}\n'
                 'more\n{"metric": "x", "value": 127.2}\n')
    assert bench_headline(p) == 127.2
    assert bench_headline(tmp_path / "absent.txt") is None


@pytest.fixture(autouse=True)
def _isolate_adopt_file():
    """These tests must never see (or leave) a real repo i8_adopt.json."""
    yield
    adopt_overrides.reload()
