#!/usr/bin/env python3
"""Run a recipe JSON: maps entry_point to the framework CLI, merging the
recipe's fixed parameters with command-line overrides (overrides win)."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

ENTRY_POINTS = {
    "pipeline": "neuralstyletransferv1_tpu.engine.pipeline",
    "style_all_weights": "neuralstyletransferv1_tpu.apps.style_all_weights",
    "morph_v2": "neuralstyletransferv1_tpu.apps.morph_v2",
    "morph": "neuralstyletransferv1_tpu.apps.morph",
    "selfstyle_blob": "neuralstyletransferv1_tpu.apps.selfstyle_blob",
    "style_morph": "neuralstyletransferv1_tpu.apps.style_morph",
    "slow_nst": None,  # root-level script
}


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: run_recipe.py <recipe.json> [entry-point args...]")
        return 2
    recipe = json.loads(Path(argv[0]).read_text())
    entry = recipe.get("entry_point", "pipeline")
    overrides = argv[1:]
    fixed = recipe.get("parameters", {}).get("fixed", {})
    args = []
    for k, v in fixed.items():
        if k not in overrides:
            args += [k, str(v)]
    args += overrides
    print(f"[recipe] {recipe.get('name')}: {entry} {' '.join(args)}")
    import importlib

    mod_name = ENTRY_POINTS.get(entry)
    if mod_name is None and entry == "slow_nst":
        import runpy

        sys.argv = ["slow_nst.py"] + args
        runpy.run_path(str(Path(__file__).parent / "slow_nst.py"), run_name="__main__")
        return 0
    if mod_name is None:
        print(f"[recipe][error] unknown entry_point: {entry}")
        return 2
    mod = importlib.import_module(mod_name)
    return mod.main(args)


if __name__ == "__main__":
    sys.exit(main())
