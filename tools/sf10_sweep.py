#!/usr/bin/env python
"""Round-8 rotating sf10 probe driver: run the remaining
never-sf10-verified oracle-backed names through tools/oracle_gate.py
against .localdata/sf10, in family-ordered batches with a wall-clock
cap per batch; any name in a failed/capped batch is retried once
individually (its own process, its own cap) so one heavy oracle never
poisons a batch's remaining names. Appends gate output to the log
given as argv[1]; prints a final summary line.

Known-infeasible names are EXCLUDED up front with recorded reasons
(no silent caps — the exclusion list is printed into the log header):
oracle-side exact-NN truth over 200k^2 embedding pairs, the
param-sweep oracle disk ceiling, and contracts whose OUTPUT is
corpus-quadratic (>10^9 pairs at sf10 on either engine).
"""

from __future__ import annotations

import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SF10 = str(REPO / ".localdata" / "sf10")

EXCLUDED = {
    # oracle computes exact NN truth over all 200k^2 = 4e10 embedding
    # pairs at sf10 (oracle-side quadratic cost; each name is
    # driver-green at sf0.01 and the approximate engine paths they
    # grade are separately sf10-green) — same class as the r7 sf1 cap:
    "brp_lsh_recall": "oracle exact-NN truth 200k^2",
    "dedup_embedding_cosine": "oracle exact-NN truth 200k^2",
    "dedup_mllib_minhash_recall": "oracle exact-NN truth 200k^2",
    "emb_hubness": "oracle exact-NN truth 200k^2",
    # oracle materializes the full signature x param grid and exceeded
    # the DuckDB spill disk ceiling already at sf1 (accepted-permanent):
    "dedup_lsh_param_sweep": "oracle disk ceiling (sf1-documented)",
    # contracted OUTPUT is corpus-quadratic: ~1e10-pair results at
    # sf10 are infeasible to materialize on EITHER engine; each is
    # checksum-gated at sf1 (join_range 110.0M pairs, adamic_adar
    # 108.6M pairs, simhash 60.0M pairs, ngram_jaccard same family):
    "join_range": "quadratic output contract (sf1 checksum-gated)",
    "graph_adamic_adar": "quadratic output contract (sf1 checksum-gated)",
    "dedup_simhash": "quadratic output contract (sf1 checksum-gated)",
    "dedup_ngram_jaccard": "quadratic output contract (sf1 checksum-gated)",
}

import os

BATCH_CAP_S = int(os.environ.get("SF10_SWEEP_BATCH_CAP", "1800"))
SOLO_CAP_S = int(os.environ.get("SF10_SWEEP_SOLO_CAP", "900"))
BATCH = int(os.environ.get("SF10_SWEEP_BATCH", "6"))


def main() -> int:
    log = Path(sys.argv[1])
    names = sys.argv[2:]
    queue = [n for n in names if n not in EXCLUDED]
    with log.open("a") as fh:
        fh.write("# sf10 sweep exclusions (explicit, with reasons):\n")
        for n, why in EXCLUDED.items():
            if n in names:
                fh.write(f"#   [DEFERRED] {n}: {why}\n")
    retry: list[str] = []
    t0 = time.time()
    for i in range(0, len(queue), BATCH):
        batch = queue[i : i + BATCH]
        rc = run_gate(batch, BATCH_CAP_S, log)
        if rc != 0:
            retry.extend(batch)
        print(
            f"[sweep] batch {i // BATCH + 1}: rc={rc} "
            f"({time.time() - t0:.0f}s elapsed)",
            flush=True,
        )
    # A capped batch may still have [OK]'d names before the timeout;
    # re-running those solo under the SMALLER cap can log a spurious
    # SOLO-FAIL for a name that already passed (ADVICE r8) — skip them.
    already_ok = passed_names(log)
    skipped = [n for n in retry if n in already_ok]
    if skipped:
        with log.open("a") as fh:
            fh.write(f"# [SOLO-SKIP already-OK in capped batch] {' '.join(skipped)}\n")
    solo_failed: list[str] = []
    for n in retry:
        if n in already_ok:
            continue
        rc = run_gate([n], SOLO_CAP_S, log)
        if rc != 0:
            solo_failed.append(n)
            with log.open("a") as fh:
                fh.write(f"# [SOLO-FAIL rc] {n}\n")
        print(f"[sweep] solo {n}: rc={rc}", flush=True)
    with log.open("a") as fh:
        fh.write(
            f"# sweep done: {len(queue)} queued, "
            f"{len(solo_failed)} unresolved after solo retry: {solo_failed}\n"
        )
    print(f"[sweep] DONE unresolved={solo_failed}")
    # Non-zero when anything is left unresolved so automation can gate
    # on the sweep's exit code (ADVICE r8).
    return 1 if solo_failed else 0


def passed_names(log: Path) -> set[str]:
    """Names with an ``[OK] name: ...`` line already in the gate log."""
    out: set[str] = set()
    if log.exists():
        for line in log.read_text().splitlines():
            if line.startswith("[OK] "):
                out.add(line[5:].split(":", 1)[0].strip())
    return out


def run_gate(names: list[str], cap: int, log: Path) -> int:
    with log.open("a") as fh:
        try:
            return subprocess.run(
                [sys.executable, str(REPO / "tools" / "oracle_gate.py"), SF10, *names],
                stdout=fh,
                stderr=subprocess.DEVNULL,
                timeout=cap,
                cwd=str(REPO),
            ).returncode
        except subprocess.TimeoutExpired:
            fh.write(f"# [TIMEOUT {cap}s] batch: {' '.join(names)}\n")
            return -1


if __name__ == "__main__":
    raise SystemExit(main())
