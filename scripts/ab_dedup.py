"""A/B harness for the dedup-family perf investigation (r5 VERDICT
task 3) — now a thin preset over the generic ``ab_queries.py`` so the
two harnesses cannot drift: same warm-up / noop-write / median
protocol, fixed to the dedup query set. Run alternately from two
worktrees (cwd decides which code runs) in one quiet host window.
"""

from __future__ import annotations

import os

os.environ.setdefault(
    "AB_QUERIES",
    "q_dedup_exact,q_dedup_minhash,q_ngram_jaccard,q_window_rolling",
)

from ab_queries import main  # noqa: E402

if __name__ == "__main__":
    main()
