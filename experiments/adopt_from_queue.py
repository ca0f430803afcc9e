"""Summarize a run_tpu_queue.sh output directory into adoption advice.

Parses the ``[name BXX] ... ms/batch ... fps`` rows and ``quality ...``
lines each mk harness prints, then recommends which stylizer constants to
flip (engine/stylizer.py `_I8_FUSED_SITES` / `_I8_FUSED_T7` / `_I8_FUSED_NST`
/ `_I8_FUSED_RECO`) per the PERF.md rule: adopt only on an in-net win
outside run noise (default margin 2%), never on quality regressions
(MAE gate 5e-2 on the harnesses' model-space outputs).

Usage: python experiments/adopt_from_queue.py [/tmp/tpu_queue]
Prints a report; makes NO code changes (flips stay a human/an explicit
edit — measured-negative discipline).
"""

import pathlib
import re
import sys

ROW = re.compile(r"\[(\S+)\s*B(\d+)\]\s+([\d.]+) ms/batch\s+([\d.]+) fps")
QUAL = re.compile(r"quality (\S+): MAE ([\d.eE+-]+)")

# harness file -> (baseline row, {variant row -> flip advice})
ADVICE = {
    "mk24_head": ("i8-pal+dec", {
        "i8-pal+head": "_I8_FUSED_SITES += ('head_i8',)",
    }),
    "mk24_paird2_on": ("i8-pal+dec", {
        "i8-pal+dec": "PAIR_D2 default ON (compare vs mk24_head's same row)",
    }),
    "mk32_t7_bn": ("pal-i8", {
        "pal+dec": "_I8_FUSED_T7 += ('dec_i8',)",
        "pal+all": "_I8_FUSED_T7 += ('dec_i8', 'c2_i8')",
        "s8c+dec": "_I8_FUSED_T7: res_i8 -> res_s8 (+dec_i8)",
        "s8c+all": "_I8_FUSED_T7: res_s8 + dec_i8 + c2_i8",
        "s8c+ds8": "_I8_FUSED_T7: res_s8 + dec_s8",
        "s8c+ds8c2": "_I8_FUSED_T7: res_s8 + dec_s8 + c2_i8",
    }),
    "mk32_t7_in": ("pal-i8", {
        "pal+dec": "_I8_FUSED_T7 += ('dec_i8',) (IN graphs)",
        "pal+all": "_I8_FUSED_T7 += ('dec_i8', 'c2_i8') (IN graphs)",
    }),
    "mk33_nst": ("pal-i8", {
        "pal+dec": "_I8_FUSED_NST += ('dec_i8',)",
        "pal+all": "_I8_FUSED_NST += ('dec_i8', 'c2_i8')",
    }),
    "mk34_reco_in": ("pal-i8", {
        "pal+dec": "_I8_FUSED_RECO += ('dec_i8',)",
    }),
    "mk34_reco_frn": ("pal-i8", {
        "pal+dec": "_I8_FUSED_RECO += ('dec_i8',) (FRN nets)",
    }),
    "mk34_reco_skip": ("pal-i8", {
        "pal-i8": "RECO_SKIP default ON (compare vs mk34_reco_in same row)",
    }),
}

MARGIN = 1.02          # adopt only on a >2% fps win
MAE_GATE = 5e-2        # harness model-space quality gate


def parse(path: pathlib.Path):
    rows: dict[tuple[str, int], float] = {}
    qual: dict[str, float] = {}
    bf16: dict[int, float] = {}
    for line in path.read_text(errors="replace").splitlines():
        m = ROW.search(line)
        if m:
            name, b, _ms, fps = m.groups()
            name = name.strip()
            if name == "bf16":
                bf16[int(b)] = float(fps)
            else:
                rows[(name, int(b))] = float(fps)
        m = QUAL.search(line)
        if m:
            qual[m.group(1)] = float(m.group(2))
    return rows, qual, bf16


def main(out_dir: str) -> int:
    d = pathlib.Path(out_dir)
    if not d.is_dir():
        print(f"no queue dir at {d}")
        return 2
    any_adopt = False
    for stem, (base_row, advice) in ADVICE.items():
        p = d / f"{stem}.txt"
        if not p.exists():
            print(f"-- {stem}: (not run)")
            continue
        rows, qual, bf16 = parse(p)
        batches = sorted({b for (_, b) in rows})
        if not batches:
            print(f"-- {stem}: no timing rows (crashed? see {p})")
            continue
        print(f"== {stem} (batches {batches}; bf16 "
              f"{', '.join(f'B{b}={v:.1f}' for b, v in sorted(bf16.items()))})")
        for variant, flip in advice.items():
            wins = []
            for b in batches:
                v = rows.get((variant, b))
                base = rows.get((base_row, b))
                if v is None or base is None:
                    continue
                wins.append((b, v, base, v / base))
            if not wins:
                print(f"   {variant}: no rows")
                continue
            ok_speed = all(r >= MARGIN for (_, _, _, r) in wins)
            mae = qual.get(variant)
            ok_qual = mae is None or mae <= MAE_GATE
            tag = "ADOPT" if (ok_speed and ok_qual) else (
                "quality-fail" if not ok_qual else "no-win")
            detail = ", ".join(
                f"B{b} {v:.1f} vs {base:.1f} ({(r - 1) * 100:+.1f}%)"
                for (b, v, base, r) in wins)
            mq = f" MAE {mae:.1e}" if mae is not None else ""
            print(f"   [{tag:12s}] {variant}: {detail}{mq}")
            if ok_speed and ok_qual:
                print(f"                -> {flip}")
                any_adopt = True
    b = d / "bench_full.txt"
    if b.exists():
        tail = [ln for ln in b.read_text(errors="replace").splitlines()
                if ln.startswith("{")]
        if tail:
            print(f"== bench_full headline: {tail[-1]}")
    if any_adopt:
        print("\nApply the flips in engine/stylizer.py, rerun the touched "
              "parity tests, then refresh bench and PERF.md per the "
              "in-net-A/B rule.")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_queue"))
