"""Tool dispatcher: ``python -m bbmap_tpu <tool> key=value ...``

The analog of the reference's one-shell-script-per-tool layer (reference:
sh/ — bbmap.sh, bbduk.sh, ...). Each tool is a module with main(argv).
"""

from __future__ import annotations

import importlib
import sys

TOOLS = {
    "bbmap": "bbmap_tpu.tools.bbmap",
    "bbduk": "bbmap_tpu.tools.bbduk",
    "bbmerge": "bbmap_tpu.tools.bbmerge",
    "reformat": "bbmap_tpu.tools.reformat",
    "randomreads": "bbmap_tpu.tools.randomreads",
    "gradesam": "bbmap_tpu.tools.gradesam",
    "stats": "bbmap_tpu.tools.stats",
    "kmercountexact": "bbmap_tpu.tools.kmercountexact",
    "bbnorm": "bbmap_tpu.tools.bbnorm",
    "dedupe": "bbmap_tpu.tools.dedupe",
    "clumpify": "bbmap_tpu.tools.clumpify",
    "bbmask": "bbmap_tpu.tools.bbmask",
    "pileup": "bbmap_tpu.tools.pileup",
    "tadpole": "bbmap_tpu.tools.tadpole",
    "seal": "bbmap_tpu.tools.seal",
    "mappacbio": "bbmap_tpu.tools.mappacbio",
}


def main() -> int:
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help", "help"):
        print("usage: python -m bbmap_tpu <tool> key=value ...")
        print("tools: " + ", ".join(sorted(TOOLS)))
        return 0
    tool = sys.argv[1].lower()
    if tool not in TOOLS:
        print(f"unknown tool {tool!r}; available: " + ", ".join(sorted(TOOLS)))
        return 1
    mod = importlib.import_module(TOOLS[tool])
    return mod.main(sys.argv[2:])


if __name__ == "__main__":
    raise SystemExit(main())
