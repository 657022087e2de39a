#!/usr/bin/env python3
"""Regenerate PLANS.md: keep the existing header and per-query notes,
replace every plan block with the fresh DumpPlans output, and require a
note for any query new to the file (supplied via notes_new.py-style dict
passed as a JSON file).

Usage: merge_plans.py <plans_dump.txt> <PLANS.md> [new_notes.json]
"""
import json
import re
import sys


def parse_dump(path):
    plans = {}
    name = None
    buf = []
    for line in open(path):
        if line.startswith("########## "):
            if name:
                plans[name] = "".join(buf).strip()
            name = line.split()[1]
            buf = []
        else:
            buf.append(line)
    if name:
        plans[name] = "".join(buf).strip()
    return plans


def parse_md(path):
    txt = open(path).read()
    m = re.search(r"^## ", txt, re.M)
    header = txt[: m.start()]
    notes = {}
    for sec in re.finditer(
        r"^## (\S+)\n\n_(.*?)_\n", txt[m.start():], re.S | re.M
    ):
        notes[sec.group(1)] = sec.group(2)
    return header, notes


def main(dump, md, new_notes_path=None):
    plans = parse_dump(dump)
    header, notes = parse_md(md)
    if new_notes_path:
        notes.update(json.load(open(new_notes_path)))
    missing = sorted(set(plans) - set(notes))
    if missing:
        sys.exit(f"no notes for new queries: {missing}")
    # the header's count line reads "N plans (+ prose-only notes ...)" —
    # match the bare word boundary, not a trailing dot, so the count can
    # never silently drift again (the r12 bug: the old r"\d+ plans\."
    # pattern matched nothing and the hand count went stale)
    header = re.sub(r"\d+ plans\b", f"{len(plans)} plans", header)
    out = [header]
    for name in sorted(plans):
        out.append(f"## {name}\n\n_{notes[name]}_\n\n```\n{plans[name]}\n```\n")
    open(md, "w").write("\n".join(out))
    print(f"wrote {len(plans)} plans to {md}")


if __name__ == "__main__":
    main(*sys.argv[1:])
