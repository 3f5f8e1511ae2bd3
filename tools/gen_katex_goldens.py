"""One-off golden generator: runs the REFERENCE normalizer (read-only, at
/root/reference) over the 35-formula fixture corpus plus branch-coverage
inputs, pins (input, expected) pairs to tests/data/katex_goldens.json, and
cross-checks texteller_spark.functions.katex against them.

This script is a build-time oracle harness only — the shipped package never
imports reference code. Run: python tools/gen_katex_goldens.py
"""

import importlib.util
import json
import sys
from pathlib import Path

REF = Path("/root/reference/src/models/ocr_model/utils/to_katex.py")
OUT = Path(__file__).resolve().parent.parent / "tests" / "data" / "katex_goldens.json"

spec = importlib.util.spec_from_file_location("ref_to_katex", REF)
ref = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ref)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from texteller_spark.functions import katex as ours  # noqa: E402

# 35 reference fixture formulas
fixtures = []
jsonl = Path("/root/reference/src/models/ocr_model/train/dataset/formulas.jsonl")
for line in jsonl.read_text().splitlines():
    rec = json.loads(line)
    fixtures.append((rec["img_name"].replace(".png", ""), rec["formula"]))

# branch-coverage cases: one per rewrite branch of to_katex.py:92-178,
# plus nesting/escape/unbalanced cases for change/change_all (:4-86)
branch_cases = [
    ("b00", r"\mbox {abc} + x"),
    ("b01", r"\mbox{a \mbox{b} c}"),
    ("b02", r"\hbox to 12.3pt{xyz}"),
    ("b03", r"\hbox{w}"),
    ("b04", r"\raise 1.5pt x"),
    ("b05", r"\raise -2.0 y"),
    ("b06", r"\makebox [3.0pt]{m}"),
    ("b07", r"\makebox{q}"),
    ("b08", r"\raisebox{-1.5pt}{r}"),
    ("b09", r"\scalebox{2.0}{s}"),
    ("b10", r"\vbox{v}"),
    ("b11", r"\Huge$x+y$"),
    ("b12", r"\large$a$ \tiny$b$"),
    ("b13", r"\boldmath {x}"),
    ("b14", r"\boldmath$y$"),
    ("b15", r"\scriptsize$z$"),
    ("b16", r"\emph{word}"),
    ("b17", r"\left{(} x \right{)}"),
    ("b18", r"\Bigg{|} y \Bigg{|}"),
    ("b19", r"\[a+b\]"),
    ("b20", r"\[a\] mid \[b\]"),
    ("b21", r"x\,\,y\!z\;\;w\:q"),
    ("b22", r"a\vspace{1em}b"),
    ("b23", r"\text{foo} \text{bar} \text{baz} end"),
    ("b24", r"{\bf bold} text"),
    ("b25", r"cost is $x$ here"),
    ("b26", r"\mbox$p$ stays"),
    ("b27", r"a    b     c"),
    ("b28", r"\mbox{unbalanced"),
    ("b29", r"\mbox{esc \} brace}"),
    ("b30", r"\mbox{esc \\} tail}"),
    ("b31", r"\mbox{a{b{c}d}e}"),
    ("b32", r"\mboxX not an arg"),
    ("b33", r"\emph{outer \emph{inner}}"),
    ("b34", r"\Big{(}\frac{a}{b}\Big{)}"),
    ("b35", r"\hbox to -12.5{neg}"),
    ("b36", r"\text{one}\text{two}"),
    ("b37", r"\[x=1\]\[y=2\]"),
    ("b38", r"pay $5 and $10 total"),  # unbalanced-ish dollars
    ("b39", r"\boldmath {a \boldmath {b}}"),
    ("b40", r"\mathbf{M}v = \lambda v"),
    ("b41", r"\left( \frac{x}{y} \right)"),
]

goldens = {"to_katex": [], "debold_inline": [], "rewrite_all": []}
mismatches = 0

for fid, raw in fixtures + branch_cases:
    exp = ref.to_katex(raw)
    got = ours.latex_to_katex(raw)
    goldens["to_katex"].append({"id": fid, "raw": raw, "expected": exp})
    if exp != got:
        mismatches += 1
        print(f"MISMATCH to_katex [{fid}]\n  raw: {raw!r}\n  ref: {exp!r}\n  got: {got!r}")

# inline de-bolding parity (mix_inference.py:245-259 semantics)
debold_cases = [
    r"\bm{x} + y",
    r"\boldsymbol{\alpha}\textbf{B}",
    r"\textit{it}\mathbf{M}",
    r"\begin{split}a\\b\end{split}",
    r"\bm{a \bm{b}}",
    r"plain",
]
for raw in debold_cases:
    exp = raw
    for args in [
        (r"\bm", r" ", r"{", r"}", r"", r" "),
        (r"\boldsymbol", r" ", r"{", r"}", r"", r" "),
        (r"\textit", r" ", r"{", r"}", r"", r" "),
        (r"\textbf", r" ", r"{", r"}", r"", r" "),
        (r"\textbf", r" ", r"{", r"}", r"", r" "),
        (r"\mathbf", r" ", r"{", r"}", r"", r" "),
    ]:
        exp = ref.change_all(exp, *args)
    exp = exp.replace(r"\begin{split}", r"\begin{aligned}")
    exp = exp.replace(r"\end{split}", r"\end{aligned}")
    import re as _re

    exp = _re.sub(r" +", " ", exp)
    got = ours.debold_inline(raw)
    goldens["debold_inline"].append({"raw": raw, "expected": exp})
    if exp != got:
        mismatches += 1
        print(f"MISMATCH debold {raw!r}\n  ref: {exp!r}\n  got: {got!r}")

# direct rewrite_all vs change_all on adversarial inputs
adv = [
    (r"\cmd{a\}b}", (r"\cmd", r"\new", "{", "}", "[", "]")),
    (r"\cmd{a{b}c} \cmd{d}", (r"\cmd", r"\new", "{", "}", "[", "]")),
    (r"\cmd{open", (r"\cmd", r"\new", "{", "}", "[", "]")),
    (r"\cmd$a\$b$", (r"\cmd", r"\new", "$", "$", "{", "}")),
    (r"\cmd{x \cmd{y} z}", (r"\cmd", r" ", "{", "}", "", "")),
    (r"pre\cmdno post", (r"\cmd", r"\new", "{", "}", "[", "]")),
    (r"\cmd{a\\}", (r"\cmd", r"\new", "{", "}", "[", "]")),
    (r"\cmd{\cmd{\cmd{x}}}", (r"\cmd", r" ", "{", "}", "", " ")),
]
for raw, args in adv:
    exp = ref.change_all(raw, *args)
    got = ours.rewrite_all(raw, *args)
    goldens["rewrite_all"].append({"raw": raw, "args": list(args), "expected": exp})
    if exp != got:
        mismatches += 1
        print(f"MISMATCH rewrite_all {raw!r} {args}\n  ref: {exp!r}\n  got: {got!r}")

OUT.parent.mkdir(parents=True, exist_ok=True)
OUT.write_text(json.dumps(goldens, indent=1))
print(f"\n{len(goldens['to_katex'])} to_katex + {len(goldens['debold_inline'])} debold + "
      f"{len(goldens['rewrite_all'])} rewrite goldens → {OUT}")
print("PARITY OK" if mismatches == 0 else f"{mismatches} MISMATCHES")
sys.exit(1 if mismatches else 0)
