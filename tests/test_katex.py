"""Golden + property tests for the KaTeX normalization kernel.

Goldens in tests/data/katex_goldens.json were produced by running the
reference normalizer (/root/reference/src/models/ocr_model/utils/to_katex.py)
over the 35-formula fixture corpus (formulas.jsonl) plus branch-coverage
inputs via tools/gen_katex_goldens.py; byte equality here IS the per-span
identity contract.
"""

import json
from pathlib import Path

import pytest

from texteller_spark.functions.katex import (
    debold_inline,
    latex_to_katex,
    matching_delimiter,
    rewrite_all,
    strip_plain_dollar_wrappers,
    wrap_span,
)

GOLDENS = json.loads(
    (Path(__file__).parent / "data" / "katex_goldens.json").read_text()
)


@pytest.mark.parametrize(
    "case", GOLDENS["to_katex"], ids=[c["id"] for c in GOLDENS["to_katex"]]
)
def test_to_katex_golden(case):
    assert latex_to_katex(case["raw"]) == case["expected"]


@pytest.mark.parametrize("case", GOLDENS["debold_inline"])
def test_debold_golden(case):
    assert debold_inline(case["raw"]) == case["expected"]


@pytest.mark.parametrize("case", GOLDENS["rewrite_all"])
def test_rewrite_all_golden(case):
    assert rewrite_all(case["raw"], *case["args"]) == case["expected"]


@pytest.mark.parametrize(
    "case", GOLDENS["to_katex"], ids=[c["id"] for c in GOLDENS["to_katex"]]
)
def test_to_katex_idempotent_on_corpus(case):
    """Second application is a fixpoint on the golden corpus (SURVEY §5.2.4)."""
    once = latex_to_katex(case["raw"])
    assert latex_to_katex(once) == once


def test_matching_delimiter_basic():
    assert matching_delimiter("{ab}", 0, "{", "}") == 3
    assert matching_delimiter("{a{b}c}", 0, "{", "}") == 6
    assert matching_delimiter(r"{a\}b}", 0, "{", "}") == 5
    assert matching_delimiter(r"{a\\}", 0, "{", "}") == 4
    assert matching_delimiter("{never", 0, "{", "}") == -1
    assert matching_delimiter("$a$", 0, "$", "$") == 2


def test_rewrite_braced_not_followed_by_open():
    # cmd not followed by its opener is left verbatim, not rescanned
    assert rewrite_all(r"\cmdX \cmd{y}", r"\cmd", r"\new", "{", "}", "[", "]") == (
        r"\cmdX \new[y]"
    )


def test_strip_plain_dollar_wrappers():
    assert strip_plain_dollar_wrappers("a $x$ b") == "a  x  b"
    # command-glued dollars are protected
    assert strip_plain_dollar_wrappers(r"\mbox$x$") == r"\mbox$x$"


def test_wrap_span():
    assert wrap_span("embedding", "x") == " $x$ "
    assert wrap_span("isolated", "x") == "\n\n$$x$$\n\n"
    assert wrap_span("text", "x") == "x"


def test_hypothesis_like_fuzz_never_crashes():
    """Kernel must be total over arbitrary junk (detection can hand it
    anything a web page contains)."""
    try:
        from hypothesis import given, settings
        from hypothesis import strategies as st
    except ImportError:
        pytest.skip("hypothesis unavailable")

    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet="\\{}$abmox \t\n[]()^_", max_size=80))
    def run(s):
        out = latex_to_katex(s)
        assert isinstance(out, str)
        assert latex_to_katex(out) is not None

    run()
