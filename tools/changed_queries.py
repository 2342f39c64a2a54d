#!/usr/bin/env python3
"""Print the query names whose definitions changed since a git ref.

Attribution is line-range-accurate: each `"name" -> ...` entry in a
query source owns the lines from its declaration to the next one; a
changed post-image line inside that range marks the query dirty. (A
hunk-local nearest-declaration heuristic mis-attributes edits deep in a
body — the exact miss that let doc_dsir_weights ship unchecked in r7.)

Usage: python3 tools/changed_queries.py [since-ref]   (default HEAD~1)
"""
import re, subprocess, sys

REF = sys.argv[1] if len(sys.argv) > 1 else "HEAD~1"
DECL = re.compile(r'^\s*"([a-z0-9_]+)"\s*->')

files = subprocess.run(
    ["git", "diff", "--name-only", REF, "--",
     "src/main/scala/graft/queries/*.scala"],
    capture_output=True, text=True, check=True).stdout.split()

dirty = set()
for path in files:
    # post-image line numbers touched by the diff (added/context edge)
    diff = subprocess.run(["git", "diff", "-U0", REF, "--", path],
                          capture_output=True, text=True, check=True).stdout
    changed = set()
    for m in re.finditer(r"^@@ -\S+ \+(\d+)(?:,(\d+))? @@", diff, re.M):
        start = int(m.group(1))
        count = int(m.group(2)) if m.group(2) is not None else 1
        # pure deletions report count 0 at the line BEFORE the removal;
        # mark the two surrounding post-image lines so the owning query
        # is still flagged
        changed.update(range(start, start + max(count, 2)))
    try:
        lines = open(path).read().splitlines()
    except FileNotFoundError:  # file deleted: every query it held is gone
        continue
    ranges = []  # (start_line_1idx, name)
    for i, line in enumerate(lines, 1):
        m = DECL.match(line)
        if m:
            ranges.append((i, m.group(1)))
    for idx, (start, name) in enumerate(ranges):
        end = ranges[idx + 1][0] - 1 if idx + 1 < len(ranges) else len(lines)
        if any(start <= c <= end for c in changed):
            dirty.add(name)
    # Shared helpers live BEFORE the first declaration (ivfCellsRaw,
    # minhashSigs, lshPairsShared, ...); an edit there feeds every
    # query in the file, so attribute it conservatively to ALL of them
    # rather than silently skipping the gate (review finding r8).
    if ranges and any(c < ranges[0][0] for c in changed):
        dirty.update(name for _, name in ranges)

print(" ".join(sorted(dirty)))
