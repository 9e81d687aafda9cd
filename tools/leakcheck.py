#!/usr/bin/env python3
"""Self-stamped leak scan (the r11 advisory: a leak artifact carrying only
a round number is indistinguishable from a hand-relabel of the previous
round's). Scans the working tree for the same seven categories the
driver's scan reports and emits LEAKCHECK.json WITH a scanned-at
timestamp and the HEAD commit it scanned, so freshness is provable from
the artifact alone.

Run at round close: python3 tools/leakcheck.py   (exit 0 = clean)
Dev tooling only — not part of the library.
"""
import datetime
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCAN_EXT = {".scala", ".sbt", ".py", ".sh", ".md", ".json", ".sql", ".conf"}
SKIP_DIRS = {"target", ".git", "spark-warehouse", ".bloop", ".metals", "project"}
SKIP_FILES = {"LEAKCHECK.json"}  # the artifact itself quotes category names

PUBLIC_URL_HOSTS = re.compile(
    r"(localhost|127\.0\.0\.1|example\.(org|com|net)|apache\.org|github\.com|"
    r"spark\.apache\.org|scala-lang\.org|duckdb\.org|open-meteo\.com|"
    r"w3\.org|wikipedia\.org|arxiv\.org|acm\.org|ietf\.org|json\.org)")

CATEGORIES = {
    # an import rooted in a company-style namespace (com./net./io./ai.…)
    # that is not a known-public library — local/object imports
    # (spark.implicits, graft classes, stdlib) never match
    "internal-import": re.compile(
        r"^\s*import\s+(?:(?:com|net|io|ai|dev|corp|internal)\.)"
        r"(?!sun\.|github\.|fasterxml\.|google\.common)[\w.]*", re.M),
    # URLs pointing anywhere non-public
    "internal-url": re.compile(r"https?://(?![^\s\"')]*?"
                               + PUBLIC_URL_HOSTS.pattern + r")[\w.-]+"),
    "internal-pkg2": re.compile(
        r"\b(?:maven|pypi|npm)\.(?!org\b|apache)[\w-]+\.[\w.-]+"),
    # object-store buckets that name a real (non-placeholder) bucket
    "internal-bucket": re.compile(
        r"\b(?:s3a?|gs|wasbs?|abfss?)://(?!<|\$\{|bucket\b|my-bucket\b|\.\.\.)"
        r"[\w][\w.-]{2,}"),
    "slack-link": re.compile(r"\b[\w-]*slack\.com/|\bgo/[a-z][\w-]{2,}\b"),
    # credential shapes: AWS key ids, bearer/PAT prefixes, long hex secrets
    "api-key": re.compile(
        r"\b(AKIA[0-9A-Z]{16}|xox[baprs]-[\w-]{10,}|ghp_[A-Za-z0-9]{30,}"
        r"|sk-[A-Za-z0-9]{20,}|eyJhbGciOi[\w.-]{20,})\b"),
    "axon-env": re.compile(r"\b[A-Z][A-Z0-9_]*AXON[A-Z0-9_]*\b|\bAXON_[A-Z0-9_]+\b"),
}


def scan():
    hits = {k: [] for k in CATEGORIES}
    for dirpath, dirnames, filenames in os.walk(ROOT):
        dirnames[:] = [d for d in dirnames if d not in SKIP_DIRS]
        for fn in filenames:
            if os.path.splitext(fn)[1] not in SCAN_EXT or fn in SKIP_FILES:
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, ROOT)
            try:
                text = open(path, encoding="utf-8", errors="replace").read()
            except OSError:
                continue
            for cat, rx in CATEGORIES.items():
                for m in rx.finditer(text):
                    line = text.count("\n", 0, m.start()) + 1
                    hits[cat].append(f"{rel}:{line}: {m.group(0)[:80]}")
    return hits


def main():
    head = subprocess.run(["git", "-C", ROOT, "rev-parse", "HEAD"],
                          capture_output=True, text=True).stdout.strip()
    dirty = subprocess.run(["git", "-C", ROOT, "status", "--porcelain"],
                           capture_output=True, text=True).stdout.strip()
    hits = scan()
    art = {
        "round": int(sys.argv[1]) if len(sys.argv) > 1 else None,
        "scanned_at": datetime.datetime.now(datetime.timezone.utc)
            .isoformat(timespec="seconds"),
        "commit": head + ("+dirty" if dirty else ""),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    out = os.path.join(ROOT, "LEAKCHECK.json")
    with open(out, "w") as f:
        json.dump(art, f, indent=2)
        f.write("\n")
    # round-suffixed copy: a tracked home the driver's own LEAKCHECK.json
    # overwrite can't clobber (r12 verdict order 3) — the stamp survives
    if art["round"] is not None:
        with open(os.path.join(ROOT, f"LEAKCHECK_r{art['round']}.json"), "w") as f:
            json.dump(art, f, indent=2)
            f.write("\n")
    print(f"leakcheck: {art['n_hits']} hits at {art['commit'][:12]} -> {out}")
    for cat, v in hits.items():
        for h in v[:5]:
            print(f"  [{cat}] {h}")
    return 1 if art["n_hits"] else 0


if __name__ == "__main__":
    sys.exit(main())
