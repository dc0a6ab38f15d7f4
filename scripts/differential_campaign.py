"""Large-scale differential campaign vs the compiled reference harness.

Reuses the helpers in tests/test_reference_differential.py (fragment
grammar, Rust-Display formatting, batch harness invocation) to drive
fresh-seeded byte buffers through the reference lexer/parser and the
Python port, requiring identical output.

Usage: python scripts/differential_campaign.py [n_lex] [n_rand] [n_parse] [seed]
Defaults: 150000 50000 50000 <time-derived seed printed for replay>.
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

import test_reference_differential as td  # noqa: E402


def main():
    if td.HARNESS is None:
        print("rustc unavailable; harness not built")
        return 1
    n_lex = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    n_rand = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    n_parse = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else int(time.time())
    print(f"seed={seed}")
    rng = random.Random(seed)
    t0 = time.monotonic()
    total = 0
    BATCH = 5_000

    def run_lex(bufs):
        nonlocal total
        ref = td.ref_lex_many(bufs)
        for buf, ref_lines in zip(bufs, ref):
            got = td.py_lex_lines(buf)
            assert got == ref_lines, f"LEX DIVERGENCE buf={buf!r}\nref={ref_lines}\ngot={got}"
        total += len(bufs)

    def run_parse(bufs):
        nonlocal total
        ref = td.ref_parse_many(bufs)
        for buf, ref_line in zip(bufs, ref):
            got = td.py_parse_line(buf)
            assert got == ref_line, f"PARSE DIVERGENCE buf={buf!r}\nref={ref_line}\ngot={got}"
        total += len(bufs)

    done = 0
    while done < n_lex:
        k = min(BATCH, n_lex - done)
        run_lex(
            [
                b"".join(rng.choice(td.FRAGMENTS) for _ in range(rng.randrange(1, 12)))
                for _ in range(k)
            ]
        )
        done += k
    print(f"lexer fragments: {n_lex} ok ({time.monotonic()-t0:.0f}s)")

    done = 0
    while done < n_rand:
        k = min(BATCH, n_rand - done)
        run_lex(
            [
                bytes(rng.randrange(256) for _ in range(rng.randrange(1, 80)))
                for _ in range(k)
            ]
        )
        done += k
    print(f"lexer random bytes: {n_rand} ok ({time.monotonic()-t0:.0f}s)")

    done = 0
    while done < n_parse:
        k = min(BATCH, n_parse - done)
        run_parse(
            [
                b"".join(
                    rng.choice(td.PARSE_FRAGMENTS) for _ in range(rng.randrange(1, 10))
                )
                for _ in range(k)
            ]
        )
        done += k
    print(f"parser trees: {n_parse} ok ({time.monotonic()-t0:.0f}s)")
    print(f"TOTAL {total} buffers, 0 divergences, {time.monotonic()-t0:.0f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
