"""Turn a run_tpu_queue.sh output directory into adoption decisions.

Parses the ``[name BXX] ... ms/batch ... fps`` rows and ``quality ...``
lines each mk harness prints, then decides which stylizer constants to flip
(engine/stylizer.py ``_I8_FUSED_*`` via ``adopt_overrides``, plus the
``PAIR_D2`` / ``RECO_SKIP`` kernel-form flags) per the PERF.md rule: adopt
only on an in-net win outside run noise (default margin 2%) that passes the
harness quality gate (MAE 5e-2 on model-space outputs).

Usage:
  python experiments/adopt_from_queue.py [/tmp/tpu_queue]          # report
  python experiments/adopt_from_queue.py [/tmp/tpu_queue] --apply  # + write
      neuralstyletransferv1_tpu/i8_adopt.json so the engine rides the wins
      (the watch loop then re-runs bench.py and deletes the file if the
      headline regressed — see experiments/tpu_watch.sh)
  python experiments/adopt_from_queue.py --bench-regressed OLD NEW  # exit 1
      if NEW's headline JSON line is >1% below OLD's

Decision model: each harness file measures variants against a base row;
a variant is a token set (e.g. ``s8c+ds8`` = {res_s8, dec_s8}). Per file
the best variant whose every batch ratio clears MARGIN and whose MAE
passes is chosen. Targets shared across norm variants (t7 bn/in, reco
in/frn) use a veto rule: a token that is *operative* in another file of
the same target (present in that file's rows and not masked by a chosen
carry token, e.g. dec_i8 is masked wherever dec_s8 is chosen) must have
been chosen there too, else it is dropped.
"""

import json
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from neuralstyletransferv1_tpu import adopt_overrides  # noqa: E402

ROW = re.compile(r"\[(\S+)\s*B(\d+)\]\s+([\d.]+) ms/batch\s+([\d.]+) fps")
QUAL = re.compile(r"quality (\S+): MAE ([\d.eE+-]+)")

MARGIN = 1.02          # adopt only on a >2% fps win on every batch size
MAE_GATE = 5e-2        # harness model-space quality gate
BENCH_MARGIN = 0.99    # post-adoption headline must stay within 1%

#: canonical token order for printing / the written tuples. ``xla_only`` is
#: a pseudo-token: when it wins, the target's fused-site tuple becomes ()
#: (quantized convs ride plain XLA int8 — the mk32 BN-form winner).
ORDER = ("res_i8", "res_s8", "dec_s8", "dec_i8", "c2_i8", "head_i8",
         "tail_s8", "xla_only")
#: token -> carry tokens that mask it at runtime (no veto where masked)
MASKS = {"dec_i8": {"dec_s8"}}
TARGET_NAME = {"sites": "_I8_FUSED_SITES", "sites_static": "_I8_FUSED_STATIC",
               "t7": "_I8_FUSED_T7", "t7_bn": "_I8_FUSED_T7_BN",
               "nst": "_I8_FUSED_NST",
               "reco": "_I8_FUSED_RECO", "nst_static": "_I8_FUSED_NST_STATIC",
               "reco_static": "_I8_FUSED_RECO_STATIC"}

#: harness file -> target tuple, base row, variant rows (token sets), and
#: quality-line name remaps where the harness prints different names
FILES = {
    "mk24_head": dict(
        target="sites", base="i8-pal+dec",
        rows={"i8-pal+head": frozenset({"head_i8"})},
        qual={"i8-pal+head": "pallas+head"}),
    "mk35_static": dict(
        target="sites_static", base="i8-static",
        rows={"i8-s8c": frozenset({"res_s8"}),
              "i8-s8c+ds8": frozenset({"res_s8", "dec_s8"}),
              "i8-s8c+head": frozenset({"res_s8", "dec_s8", "head_i8"}),
              "i8-s8c+tail": frozenset({"res_s8", "dec_s8", "tail_s8"}),
              "i8-s8c+full": frozenset({"res_s8", "dec_s8", "head_i8",
                                        "tail_s8"}),
              # the mk32 BN-form configuration on the flagship: no Pallas
              # sites, every XLA-safe site (QUANT_SITES) on plain XLA int8
              # with the frozen-norm quantize affines constant-folded
              "i8-xla": frozenset({"xla_only"})}),
    "mk32_t7_bn": dict(
        target="t7_bn", base="pal-i8",
        rows={
            "xla-i8": frozenset({"xla_only"}),
            "pal+dec": frozenset({"dec_i8"}),
            "pal+all": frozenset({"dec_i8", "c2_i8"}),
            "s8c+dec": frozenset({"res_s8", "dec_i8"}),
            "s8c+all": frozenset({"res_s8", "dec_i8", "c2_i8"}),
            "s8c+ds8": frozenset({"res_s8", "dec_s8"}),
            "s8c+ds8c2": frozenset({"res_s8", "dec_s8", "c2_i8"}),
            "s8c+tail": frozenset({"res_s8", "dec_s8", "tail_s8"}),
        }),
    "mk32_t7_in": dict(
        target="t7", base="pal-i8",
        rows={"xla-i8": frozenset({"xla_only"}),
              "pal+dec": frozenset({"dec_i8"}),
              "pal+all": frozenset({"dec_i8", "c2_i8"})}),
    "mk33_nst": dict(
        target="nst", base="pal-i8",
        rows={"xla-i8": frozenset({"xla_only"}),
              "pal+dec": frozenset({"dec_i8"}),
              "pal+all": frozenset({"dec_i8", "c2_i8"})}),
    "mk34_reco_in": dict(
        target="reco", base="pal-i8",
        rows={"xla-i8": frozenset({"xla_only"}),
              "pal+dec": frozenset({"dec_i8"})}),
    "mk34_reco_frn": dict(
        target="reco", base="pal-i8",
        rows={"xla-i8": frozenset({"xla_only"}),
              "pal+dec": frozenset({"dec_i8"})}),
    # the static-norm rows in the same harness files target the *_STATIC
    # sets ("file" reuses the stem's output; base = the default static set)
    "mk33_nst_static": dict(
        file="mk33_nst", target="nst_static", base="i8-static",
        rows={"i8-static+dec": frozenset({"dec_i8"}),
              "i8-s8c": frozenset({"res_s8"}),
              "i8-s8c+dec": frozenset({"res_s8", "dec_i8"}),
              "i8-s8c+ds8": frozenset({"res_s8", "dec_s8", "dec_i8"}),
              "i8-s8c+tail": frozenset({"res_s8", "dec_s8", "dec_i8",
                                        "tail_s8"})}),
    "mk34_reco_in_static": dict(
        file="mk34_reco_in", target="reco_static", base="i8-static",
        rows={"i8-static+dec": frozenset({"dec_i8"}),
              "i8-s8c": frozenset({"res_s8"}),
              "i8-s8c+dec": frozenset({"res_s8", "dec_i8"}),
              "i8-s8c+ds8": frozenset({"res_s8", "dec_s8", "dec_i8"})}),
    "mk34_reco_frn_static": dict(
        file="mk34_reco_frn", target="reco_static", base="i8-static",
        rows={"i8-static+dec": frozenset({"dec_i8"}),
              "i8-s8c": frozenset({"res_s8"}),
              "i8-s8c+dec": frozenset({"res_s8", "dec_i8"}),
              "i8-s8c+ds8": frozenset({"res_s8", "dec_s8", "dec_i8"})}),
}

#: boolean flips measured as same-row comparisons across two files
CROSS = {
    "pair_d2": dict(file="mk24_paird2_on", base_file="mk24_head",
                    row="i8-pal+dec", qual="pallas+dec",
                    note="column-pair (K=128) d2 form"),
    "reco_skip": dict(file="mk34_reco_skip", base_file="mk34_reco_in",
                      row="pal-i8", qual="pal-i8",
                      note="ReCoNet combine folded into the next a-site"),
}


def parse(path: pathlib.Path):
    """-> ({(variant, batch): fps}, {quality name: mae}, {batch: bf16 fps})"""
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


def _fmt_tokens(tokens) -> str:
    return " + ".join(t for t in ORDER if t in tokens) or "(defaults)"


def _eval_file(stem: str, spec: dict, d: pathlib.Path, lines: list):
    """Evaluate one harness file; returns the chosen token set or None if
    the file didn't run / had no usable rows. Appends report lines."""
    p = d / f"{spec.get('file', stem)}.txt"
    if not p.exists():
        lines.append(f"-- {stem}: (not run)")
        return None
    rows, qual, bf16 = parse(p)
    batches = sorted({b for (_, b) in rows})
    if not batches:
        lines.append(f"-- {stem}: no timing rows (crashed? see {p})")
        return None
    lines.append(
        f"== {stem} (batches {batches}; bf16 "
        + ", ".join(f"B{b}={v:.1f}" for b, v in sorted(bf16.items())) + ")")
    best: tuple[float, frozenset] | None = None
    for variant, tokens in spec["rows"].items():
        wins = []
        for b in batches:
            v, base = rows.get((variant, b)), rows.get((spec["base"], b))
            if v is not None and base is not None:
                wins.append((b, v, base, v / base))
        if not wins:
            lines.append(f"   {variant}: no rows")
            continue
        ok_speed = all(r >= MARGIN for (_, _, _, r) in wins)
        mae = qual.get(spec.get("qual", {}).get(variant, variant))
        ok_qual = mae is None or mae <= MAE_GATE
        tag = ("ADOPT" if (ok_speed and ok_qual)
               else "quality-fail" if not ok_qual else "no-win")
        detail = ", ".join(f"B{b} {v:.1f} vs {base:.1f} ({(r - 1) * 100:+.1f}%)"
                           for (b, v, base, r) in wins)
        mq = f" MAE {mae:.1e}" if mae is not None else ""
        lines.append(f"   [{tag:12s}] {variant}: {detail}{mq}")
        if ok_speed and ok_qual:
            mean = sum(r for (_, _, _, r) in wins) / len(wins)
            if best is None or mean > best[0]:
                best = (mean, tokens)
    chosen = best[1] if best else frozenset()
    if chosen:
        lines.append(f"                -> {TARGET_NAME[spec['target']]}: "
                     f"{_fmt_tokens(chosen)}")
    return chosen


def _eval_cross(key: str, spec: dict, d: pathlib.Path, lines: list) -> bool:
    pv, pb = d / f"{spec['file']}.txt", d / f"{spec['base_file']}.txt"
    if not (pv.exists() and pb.exists()):
        lines.append(f"-- {key}: (not run)")
        return False
    vrows, vqual, _ = parse(pv)
    brows, _, _ = parse(pb)
    row = spec["row"]
    wins = []
    for (name, b), v in sorted(vrows.items()):
        if name == row and (row, b) in brows:
            wins.append((b, v, brows[(row, b)], v / brows[(row, b)]))
    if not wins:
        lines.append(f"-- {key}: no comparable '{row}' rows")
        return False
    ok_speed = all(r >= MARGIN for (_, _, _, r) in wins)
    mae = vqual.get(spec["qual"])
    ok_qual = mae is None or mae <= MAE_GATE
    tag = ("ADOPT" if (ok_speed and ok_qual)
           else "quality-fail" if not ok_qual else "no-win")
    detail = ", ".join(f"B{b} {v:.1f} vs {base:.1f} ({(r - 1) * 100:+.1f}%)"
                       for (b, v, base, r) in wins)
    mq = f" MAE {mae:.1e}" if mae is not None else ""
    lines.append(f"== {key} ({spec['note']}; cross-file vs "
                 f"{spec['base_file']})\n   [{tag:12s}] {row}: {detail}{mq}")
    return ok_speed and ok_qual


def decide(out_dir: str):
    """-> (report lines, adopted config dict or None-if-no-change)."""
    d = pathlib.Path(out_dir)
    lines: list[str] = []
    chosen_by_file: dict[str, frozenset | None] = {}
    for stem, spec in FILES.items():
        chosen_by_file[stem] = _eval_file(stem, spec, d, lines)

    config: dict = {}
    not_run: set[str] = set()
    for target in ("sites", "sites_static", "t7", "t7_bn", "nst", "reco",
                   "nst_static", "reco_static"):
        stems = [s for s, sp in FILES.items() if sp["target"] == target]
        ran = [s for s in stems if chosen_by_file.get(s) is not None]
        if not ran:
            not_run.add(target)
        adopted: set[str] = set()
        for s in ran:
            adopted |= chosen_by_file[s]  # type: ignore[arg-type]
        # veto: a token operative-but-unchosen in a sibling file is dropped
        for tok in sorted(adopted):
            for s in ran:
                universe = frozenset().union(*FILES[s]["rows"].values())
                chosen = chosen_by_file[s] or frozenset()
                masked = bool(MASKS.get(tok, set()) & chosen)
                if tok in universe and not masked and tok not in chosen:
                    adopted.discard(tok)
                    lines.append(f"   (veto) {tok} dropped from {target}: "
                                 f"{s} ran it without a win")
                    break
        base = set(adopt_overrides.DEFAULTS[target])
        if "xla_only" in adopted:
            # pseudo-token: the winning variant ran with NO fused sites —
            # the adopted tuple is empty (plain XLA int8 on quant sites)
            final: tuple = ()
        else:
            final = tuple(t for t in ORDER if t in (base | adopted))
        if set(final) != base:
            config[target] = list(final)

    for key, spec in CROSS.items():
        if _eval_cross(key, spec, d, lines):
            config[key] = True

    b = d / "bench_full.txt"
    if b.exists():
        h = bench_headline(b)
        if h is not None:
            lines.append(f"== bench_full headline: {h:.2f} fps")
    return lines, (config or None), not_run


def bench_headline(path) -> float | None:
    """The 'value' of the last headline JSON line in a bench output file."""
    try:
        text = pathlib.Path(path).read_text(errors="replace")
    except OSError:
        return None
    val = None
    for line in text.splitlines():
        if line.startswith("{") and '"metric"' in line:
            try:
                val = float(json.loads(line)["value"])
            except (ValueError, KeyError, TypeError):
                continue
    return val


def main(out_dir: str, apply: bool = False) -> int:
    lines, config, not_run = decide(out_dir)
    print("\n".join(lines) if lines else f"no queue dir at {out_dir}")
    if not pathlib.Path(out_dir).is_dir():
        return 2
    # a target whose harness produced no usable rows this window keeps its
    # PREVIOUSLY adopted value (a truncated/crashed rerun must not silently
    # revert a measured adoption); a target that ran and shows no win is
    # deliberately absent = back to defaults.
    prev = adopt_overrides._load()
    kept = {k: v for k, v in prev.items()
            if k in not_run and k not in (config or {})}
    if config is None and not kept:
        print("\nNo flips clear the margin+quality gates; defaults stand.")
        return 0
    config = {**kept, **(config or {})}
    print("\nAdoption plan:")
    for k, v in sorted(config.items()):
        tag = " (kept: harness not run this window)" if k in kept else ""
        print(f"  {k} = {v}{tag}")
    if apply:
        config["source"] = f"adopt_from_queue --apply @ {out_dir}"
        adopt_overrides.PATH.write_text(json.dumps(config, indent=1) + "\n")
        print(f"wrote {adopt_overrides.PATH} — bench must confirm the "
              f"headline (tpu_watch.sh reverts on regression)")
    else:
        print("(report only — rerun with --apply, or edit "
              "engine/stylizer.py, then refresh bench + PERF.md)")
    return 0


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:]]
    if argv[:1] == ["--bench-regressed"]:
        old, new = bench_headline(argv[1]), bench_headline(argv[2])
        if new is None:
            print(f"bench compare: post-adoption headline missing (old={old})")
            sys.exit(1)
        # old may be missing (queue bench crashed): the A/B rows justified
        # the adoption; a successful post-adoption bench stands on its own.
        ok = old is None or new >= old * BENCH_MARGIN
        print(f"bench compare: old {old:.2f} -> new {new:.2f} fps "
              f"({'OK' if ok else 'REGRESSED'})")
        sys.exit(0 if ok else 1)
    apply = "--apply" in argv
    argv = [a for a in argv if a != "--apply"]
    sys.exit(main(argv[0] if argv else "/tmp/tpu_queue", apply=apply))
