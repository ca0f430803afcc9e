"""Queue adoption advisor (experiments/adopt_from_queue.py) parsing and
recommendation logic — pure-text, no jax."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from experiments.adopt_from_queue import MARGIN, parse  # noqa: E402

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
    from experiments.adopt_from_queue import main

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
