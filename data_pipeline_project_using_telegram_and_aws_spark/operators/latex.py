r"""LaTeX → visible text as JVM column expressions (north-star
extension; the reference pipeline has no document surface — this is
the scientific-corpus twin of `operators/html.py`: arXiv-class
sources are LaTeX, and a training-data pipeline either converts them
or loses the single densest source of technical prose).

Everything here is ``pyspark.sql.functions`` expression chains —
regexp folds inside whole-stage codegen, zero Python, the same
doctrine as the HTML entity decoder. The conversion contract
(stated, tested):

- comments (unescaped ``%`` to end of line) drop;
- only the ``\\begin{document}`` body survives when a preamble
  exists (bare fragments convert whole);
- math drops: ``$$..$$``, ``$..$``, ``\\[..\\]``, ``\\(..\\)`` and
  the ``equation``/``align``/``gather``/``eqnarray``/``math``/
  ``displaymath`` environments (starred too) — math is notation,
  not prose; each leaves a single space so surrounding words never
  fuse;
- non-prose environments drop wholesale: ``figure``/``table``/
  ``tabular``/``verbatim``/``lstlisting``/``tikzpicture``/
  ``thebibliography`` (starred too);
- sectioning commands keep their title as its own line
  (``\\section{X}`` → newline + X + newline; chapter/subsection/
  subsubsection/paragraph/title alike);
- style wrappers unwrap to their argument (``\\textbf{X}`` → X;
  emph/textit/texttt/textsc/textrm/textsf/underline/mbox/footnote);
  unwrapping runs a BOUNDED number of passes (default 3), so
  nesting deeper than that keeps inner braces — the bounded-
  nesting contract, stated here rather than hidden;
- accent commands compose: ``\\'e`` → é, ``\\"o`` → ö, ``\\`a``,
  ``\\^e``, ``\\~n``, ``\\c{c}`` → ç (both braced and bare-letter
  forms), plus the letter macros (``\\ss`` → ß, ``\\ae``/``\\AE``,
  ``\\oe``/``\\OE``, ``\\o``/``\\O``, ``\\aa``/``\\AA``, ``\\l``/
  ``\\L``);
- references/labels/citations drop (``\\cite{..}``/``\\ref{..}``/
  ``\\eqref{..}``/``\\label{..}``/``\\includegraphics[..]{..}``/
  ``\\input``/``\\include``/``\\bibliography{..}`` and friends;
  ``\\href{url}{text}`` keeps its visible text);
- accented output is DECOMPOSED (base letter + combining mark —
  Spark has no NFC builtin; normalize downstream if a consumer
  needs precomposed forms), except the letter macros which are
  single precomposed characters;
- escapes restore their character (``\\%`` → %, ``\\&`` → &,
  ``\\_``, ``\\$``, ``\\#``, ``\\{``, ``\\}``), ``~`` → space,
  ``\\\\`` → newline, spacing macros → space, ``---``/``--`` →
  em/en dash, ``\`\``` and ``''`` → curly quotes;
- any command still standing after all of the above drops (its
  optional ``[..]`` argument with it), stray braces drop, and
  whitespace normalizes (3+ newlines → 2, spaces collapse).

`latex_metadata` pulls ``\\title{..}`` / ``\\author{..}`` (first
occurrence, preamble included) before the body cut, converting each
through the same inline pipeline.

Cost note: the full pipeline is ~100 chained regexp_replace
expressions — past janino's 64 KB generated-method limit, so Spark
logs an InternalCompilerException once and FALLS BACK to interpreted
expression evaluation (correctness unaffected; each regex still
compiles once per executor). The per-row cost stays data-linear and
JVM-side — the same class as the HTML entity fold, which carries the
matching justification in tools/scale_lint.py's cost notes.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["latex_to_text", "latex_metadata"]


def _rr(col: Column, pat: str, rep: str) -> Column:
    return F.regexp_replace(col, F.lit(pat), F.lit(rep))


# environments whose whole content is not prose
_DROP_ENVS = ("figure", "table", "tabular", "verbatim", "lstlisting",
              "tikzpicture", "thebibliography", "algorithm",
              "algorithmic", "minted")
# math environments (content drops, a space survives)
_MATH_ENVS = ("equation", "align", "gather", "eqnarray", "math",
              "displaymath", "multline")
# command families whose ARGUMENT drops with them
_DROP_CMDS = ("cite", "citep", "citet", "ref", "eqref", "pageref",
              "label", "includegraphics", "input", "include",
              "bibliography", "bibliographystyle", "usepackage",
              "documentclass", "url", "href", "hypersetup",
              "vspace", "hspace", "setlength", "newcommand",
              "renewcommand", "definecolor")
# wrappers that unwrap to their argument
_UNWRAP_CMDS = ("textbf", "textit", "texttt", "textsc", "textrm",
                "textsf", "emph", "underline", "mbox", "footnote",
                "text", "textup", "textsl")
_SECTION_CMDS = ("chapter", "section", "subsection", "subsubsection",
                 "paragraph", "subparagraph", "title")

# accent command -> combining mark (applied to the following letter)
_ACCENTS = {
    "'": "\u0301", "`": "\u0300", '"': "\u0308", "^": "\u0302",
    "~": "\u0303", "=": "\u0304", ".": "\u0307",
    "u": "\u0306", "v": "\u030c", "H": "\u030b", "c": "\u0327",
    "k": "\u0328", "r": "\u030a",
}
_LETTER_MACROS = {
    "ss": "ß", "ae": "æ", "AE": "Æ", "oe": "œ", "OE": "Œ",
    "o": "ø", "O": "Ø", "aa": "å", "AA": "Å", "l": "ł", "L": "Ł",
    "i": "ı", "j": "ȷ",
    "dag": "†", "ddag": "‡", "S": "§", "P": "¶",
    "copyright": "©", "pounds": "£", "dots": "…", "ldots": "…",
}


def _strip_comments(col: Column) -> Column:
    # an unescaped % (not preceded by a backslash) eats the line
    return _rr(col, r"(?<!\\)%[^\n]*", "")


def _body_only(col: Column) -> Column:
    body = F.regexp_extract(
        col, r"(?s)\\begin\{document\}(.*?)\\end\{document\}", 1
    )
    return F.when(body != "", body).otherwise(col)


def _drop_math(col: Column) -> Column:
    for env in _MATH_ENVS:
        col = _rr(
            col,
            r"(?s)\\begin\{" + env + r"\*?\}.*?\\end\{" + env + r"\*?\}",
            " ",
        )
    col = _rr(col, r"(?s)\$\$.*?\$\$", " ")
    col = _rr(col, r"(?s)\\\[.*?\\\]", " ")
    col = _rr(col, r"(?s)\\\(.*?\\\)", " ")
    # inline $..$: no escaped-$ inside, no blank line (runaway guard)
    col = _rr(col, r"\$(?:[^$\\]|\\.)+?\$", " ")
    return col


def _drop_envs(col: Column) -> Column:
    for env in _DROP_ENVS:
        col = _rr(
            col,
            r"(?s)\\begin\{" + env + r"\*?\}.*?\\end\{" + env + r"\*?\}",
            " ",
        )
    # remaining begin/end markers (itemize etc.) drop, content stays
    col = _rr(col, r"\\(?:begin|end)\{[A-Za-z*]+\}", " ")
    col = _rr(col, r"\\item\b", "\n")
    return col


_BRACE_ARG = r"\{([^{}]*)\}"  # innermost braces only — see passes


def _unwrap_commands(col: Column, passes: int) -> Column:
    for _ in range(passes):
        for cmd in _SECTION_CMDS:
            col = _rr(col, r"\\" + cmd + r"\*?\s*" + _BRACE_ARG,
                      "\n$1\n")
        for cmd in _UNWRAP_CMDS:
            col = _rr(col, r"\\" + cmd + r"\*?\s*" + _BRACE_ARG, "$1")
    return col


def _drop_commands(col: Column) -> Column:
    # \href{url}{text}: the second argument is visible prose — keep it
    col = _rr(col, r"\\href\{[^{}]*\}\{([^{}]*)\}", "$1")
    for cmd in _DROP_CMDS:
        col = _rr(
            col,
            r"\\" + cmd + r"\*?(?:\[[^\]]*\])?(?:\{[^{}]*\})+",
            " " if cmd not in ("label", "hypersetup") else "",
        )
    return col


def _accents(col: Column) -> Column:
    # letter macros FIRST so \"{\i} sees its dotless base resolved
    for macro, ch in _LETTER_MACROS.items():
        col = _rr(col, r"\\" + macro + r"(?![A-Za-z])\s?", ch)
    base = r"([^\s{}\\])"
    for mark, combining in _ACCENTS.items():
        esc = "\\" + mark if not mark.isalpha() else mark
        col = _rr(col, r"\\" + esc + r"\{" + base + r"\}",
                  "$1" + combining)
        if mark.isalpha():
            # bare form needs a separator: \c{c} vs \v w
            col = _rr(col, r"\\" + esc + r"\s+" + base,
                      "$1" + combining)
        else:
            col = _rr(col, r"\\" + esc + base, "$1" + combining)
    return col


def _escapes_and_ligatures(col: Column) -> Column:
    import re as _re

    col = _rr(col, r"\\\\(?:\[[^\]]*\])?", "\n")
    for esc in "%&_$#":
        # NB: $ is special in the Java REPLACEMENT string too
        col = _rr(col, "\\\\" + _re.escape(esc),
                  esc if esc != "$" else "\\$")
    col = _rr(col, r"\\([{}])", "$1")
    col = _rr(col, r"(?<!\\)~", " ")
    col = _rr(col, r"\\(?:,|;|!)", " ")
    col = _rr(col, r"\\q?quad\b", " ")
    col = _rr(col, r"---", "—")
    col = _rr(col, r"--", "–")
    col = _rr(col, r"``", "\u201c")
    col = _rr(col, r"''", "\u201d")
    col = _rr(col, r"`", "\u2018")
    return col


def _sweep_leftovers(col: Column) -> Column:
    # any command still standing drops, optional arg with it; stray
    # braces drop; whitespace normalizes
    col = _rr(col, r"\\[A-Za-z]+\*?(?:\[[^\]]*\])?", " ")
    col = _rr(col, r"[{}]", "")
    col = _rr(col, r"[ \t]+", " ")
    col = _rr(col, r" ?\n ?", "\n")
    col = _rr(col, r"\n{3,}", "\n\n")
    return _rr(col, r"^\s+|\s+$", "")


def _inline_pipeline(col: Column, unwrap_passes: int) -> Column:
    col = _drop_math(col)
    col = _drop_envs(col)
    col = _unwrap_commands(col, unwrap_passes)
    col = _drop_commands(col)
    col = _accents(col)
    col = _escapes_and_ligatures(col)
    return _sweep_leftovers(col)


def latex_to_text(source, unwrap_passes: int = 3) -> Column:
    """Visible prose of a LaTeX source column (module contract).
    NULL in → NULL out. ``unwrap_passes`` bounds brace nesting."""
    col = source if isinstance(source, Column) else F.col(source)
    col = _strip_comments(col)
    col = _body_only(col)
    return _inline_pipeline(col, unwrap_passes)


def latex_metadata(source) -> Column:
    """``struct(title, author)`` from the first ``\\title``/
    ``\\author`` (preamble included), each converted through the
    inline pipeline; absent → NULL."""
    col = source if isinstance(source, Column) else F.col(source)
    col = _strip_comments(col)

    def first(cmd: str) -> Column:
        # one level of nesting allowed (titles carry \emph{..} etc.)
        nested = r"\{((?:[^{}]|\{[^{}]*\})*)\}"
        raw = F.regexp_extract(col, r"\\" + cmd + r"\s*" + nested, 1)
        cooked = _inline_pipeline(raw, unwrap_passes=2)
        return F.when(raw != "", cooked)

    return F.struct(
        first("title").alias("title"),
        first("author").alias("author"),
    )
