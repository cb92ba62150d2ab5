"""Glob matcher for watch inputs and orphan whitelists.

Semantics of the reference's Matcher
(/root/reference/ice/src/main/java/com/altinity/ice/cli/internal/io/Matcher.java:24-118):
patterns with `*` wildcards; `!pattern` negates; a path matches iff
it matches ANY positive pattern AND no negative pattern. No positive
patterns ⇒ positives vacuously match.
"""

from __future__ import annotations

import fnmatch


class Matcher:
    def __init__(self, patterns: list[str]):
        self.positive = [p for p in patterns if not p.startswith("!")]
        self.negative = [p[1:] for p in patterns if p.startswith("!")]

    def matches(self, path: str) -> bool:
        pos_ok = not self.positive or any(
            fnmatch.fnmatch(path, p) for p in self.positive
        )
        neg_hit = any(fnmatch.fnmatch(path, p) for p in self.negative)
        return pos_ok and not neg_hit
