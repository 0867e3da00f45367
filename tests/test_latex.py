"""LaTeX → text (`operators/latex.py`): hand-pinned conversions over
realistic arXiv-style snippets — every expectation derived from the
module's stated contract, never echoed from a run."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.latex import (
    latex_metadata,
    latex_to_text,
)


def _convert(spark, src: str, **kw) -> str:
    df = spark.createDataFrame([(src,)], "src string")
    return df.select(latex_to_text(F.col("src"), **kw).alias("t")) \
        .collect()[0]["t"]


class TestLatexToText:
    def test_full_paper_shape(self, spark):
        src = r"""\documentclass{article}
\usepackage{amsmath}
\title{On Brewing}
\begin{document}
% a comment line
\section{Intro}
Coffee \textbf{matters}. We show $x^2 + y^2 = z^2$ holds.
\begin{equation}
  e = mc^2
\end{equation}
As seen in \cite{turing1936}, results follow~directly.
\begin{figure}
  \includegraphics[width=5cm]{plot.png}
  \caption{ignored}
\end{figure}
Final remarks --- done.
\end{document}"""
        got = _convert(spark, src)
        # paragraph breaks survive as blank lines (3+ newlines -> 2);
        # dropped math/cites leave the documented seam artifacts
        assert got == ("Intro\n\nCoffee matters. We show holds.\n\n"
                       "As seen in , results follow directly.\n\n"
                       "Final remarks — done.")

    def test_fragment_without_preamble_converts_whole(self, spark):
        assert _convert(spark, r"Plain \emph{text} here.") \
            == "Plain text here."

    def test_comments_and_escaped_percent(self, spark):
        got = _convert(spark, "100\\% sure % but this drops\nnext")
        assert got == "100% sure\nnext"

    def test_math_forms_all_drop(self, spark):
        src = (r"a $x$ b $$y$$ c \[z\] d \(w\) e "
               r"\begin{align*}q&=1\end{align*} f")
        assert _convert(spark, src) == "a b c d e f"

    def test_nested_unwrap_within_bound(self, spark):
        src = r"\textbf{bold \emph{and italic \texttt{mono}}}"
        assert _convert(spark, src) == "bold and italic mono"

    def test_sectioning_gets_own_line(self, spark):
        src = r"before \subsection*{Methods} after"
        assert _convert(spark, src) == "before\nMethods\nafter"

    def test_accents_compose_decomposed(self, spark):
        got = _convert(spark, r"caf\'e na\"{\i}ve Schr\"odinger "
                              r"gar\c{c}on \ss{} \oe uvre")
        assert got == ("cafe\u0301 na\u0131\u0308ve "
                       "Schro\u0308dinger garc\u0327on ß œuvre")

    def test_letter_macro_eats_following_space_like_tex(self, spark):
        assert _convert(spark, r"first\dots second") == "first…second"

    def test_escapes_dashes_quotes(self, spark):
        got = _convert(
            spark,
            r"AT\&T 50\_50 \$5 \#1 ``quoted'' -- and --- ends\\next")
        assert got == "AT&T 50_50 $5 #1 “quoted” – and — ends\nnext"

    def test_href_keeps_text_url_drops(self, spark):
        assert _convert(
            spark, r"see \href{http://x.example/p}{the paper} now"
        ) == "see the paper now"

    def test_itemize_items_become_lines(self, spark):
        src = (r"\begin{itemize}\item first point "
               r"\item second point\end{itemize}")
        assert _convert(spark, src) == "first point\nsecond point"

    def test_verbatim_drops_wholesale(self, spark):
        src = ("keep \\begin{verbatim}\nraw $code$ \\here\n"
               "\\end{verbatim} this")
        assert _convert(spark, src) == "keep this"

    def test_unknown_commands_swept(self, spark):
        assert _convert(
            spark, r"x \somemacro[opt] y \another z") == "x y z"

    def test_null_in_null_out(self, spark):
        df = spark.createDataFrame([(None,)], "src string")
        assert df.select(latex_to_text(F.col("src")).alias("t")) \
            .collect()[0]["t"] is None


class TestLatexMetadata:
    def test_title_author_from_preamble(self, spark):
        src = (r"\documentclass{article}"
               r"\title{On \emph{Brewing} Coffee}"
               r"\author{Ada Lovelace \and Alan Turing}"
               r"\begin{document}body\end{document}")
        df = spark.createDataFrame([(src,)], "src string")
        m = df.select(latex_metadata(F.col("src")).alias("m")) \
            .collect()[0]["m"]
        assert m["title"] == "On Brewing Coffee"
        assert m["author"] == "Ada Lovelace Alan Turing"

    def test_absent_is_null(self, spark):
        df = spark.createDataFrame([(r"no meta here",)], "src string")
        m = df.select(latex_metadata(F.col("src")).alias("m")) \
            .collect()[0]["m"]
        assert m["title"] is None and m["author"] is None
