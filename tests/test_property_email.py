"""Property-based parity: the fast EML scanner must equal the stdlib
golden parser on arbitrary generated messages (kernels/email_fast.py vs
kernels/email_extract.py). The fast path bails to the stdlib parser on
structures it doesn't model, so equality must hold for EVERY input — any
mismatch is a real fast-path bug, not an acceptable divergence.

No SparkSession needed; this pins the kernel pair the extract_spans
golden oracle depends on (dispatch runs the fast twin, reference_impl
the stdlib one).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_search_spark.kernels.email_extract import eml_to_text
from ocr_search_spark.kernels.email_fast import eml_to_text_fast

_WORDS = ["report", "данные", "счёт", "annex", "x1", "a"]

_subject = st.one_of(
    st.sampled_from(["plain subject", "=?utf-8?b?0YHRh9GR0YI=?=", ""]),
    st.text(alphabet="abc скж=?-_.", min_size=0, max_size=20),
)
_addr = st.sampled_from(
    ["user1@corp.ru", "a@b.c", '"Alice A" <alice@corp.ru>', "bad addr", ""]
)
_date = st.sampled_from(
    [
        "Mon, 10 Apr 2025 15:55:00 +0300",   # wrong weekday -> re-render
        "Thu, 10 Apr 2025 15:55:00 +0300",
        "10 Apr 2025 00:00:00 -0000",
        "not a date",
        "",
    ]
)
_cte = st.sampled_from(
    ["7bit", "8bit", "base64", "quoted-printable", "x-uuencode", ""]
)
_body = st.one_of(
    st.text(alphabet="abж \n.=-", min_size=0, max_size=60),
    st.sampled_from(["line1\nline2\n", "caf=C3=A9\n", "JVBERi0=\n", ""]),
)


@st.composite
def _message(draw):
    head = []
    if draw(st.booleans()):
        head.append(f"Subject: {draw(_subject)}")
    if draw(st.booleans()):
        head.append(f"From: {draw(_addr)}")
    if draw(st.booleans()):
        head.append(f"To: {draw(_addr)}")
    if draw(st.booleans()):
        head.append(f"Cc: {draw(_addr)}")
    if draw(st.booleans()):
        head.append(f"Date: {draw(_date)}")
    multipart = draw(st.booleans())
    body = draw(_body)
    if multipart:
        b = "bnd1"
        head.append(f'Content-Type: multipart/mixed; boundary="{b}"')
        parts = [
            f"--{b}",
            f"Content-Type: {draw(st.sampled_from(['text/plain', 'text/html']))};"
            " charset=utf-8",
            f"Content-Transfer-Encoding: {draw(_cte)}",
            "",
            body,
        ]
        if draw(st.booleans()):
            parts += [
                f"--{b}",
                'Content-Type: application/pdf; name="d.pdf"',
                "Content-Disposition: attachment; "
                + draw(st.sampled_from(['filename="d.pdf"', ""])),
                "",
                "JVBERi0=",
            ]
        parts.append(f"--{b}--")
        return "\n".join(head) + "\n\n" + "\n".join(parts) + "\n"
    ctype = draw(
        st.sampled_from(["text/plain", "text/html", "application/json", ""])
    )
    if ctype:
        head.append(f"Content-Type: {ctype}; charset=utf-8")
    cte = draw(_cte)
    if cte:
        head.append(f"Content-Transfer-Encoding: {cte}")
    sep = draw(st.sampled_from(["\n\n", "\r\n\r\n"]))
    return "\n".join(head) + sep + body


class TestEmailFastParityProperty:
    @settings(max_examples=300, deadline=None)
    @given(_message())
    def test_fast_equals_stdlib(self, eml):
        assert eml_to_text_fast(eml) == eml_to_text(eml)


class TestXlsxRoundTripProperty:
    """Deterministic builder -> stdlib OOXML reader round trip: the
    extracted template must equal the one computed directly from the
    sheet dict (grid semantics: sparse gaps pad to "", numbers/bools
    render as literals, sheet order preserved)."""

    _cell = st.one_of(
        st.sampled_from(["итог", "x", "a b", ""]),
        st.integers(min_value=0, max_value=99999),
        st.booleans(),
        st.none(),
    )

    @settings(max_examples=60, deadline=None)
    @given(
        st.dictionaries(
            st.sampled_from(["Лист1", "Data", "S&<>"]),
            st.lists(
                st.lists(_cell, min_size=1, max_size=4),
                min_size=1,
                max_size=4,
            ),
            min_size=1,
            max_size=3,
        )
    )
    def test_round_trip(self, sheets):
        from ocr_search_spark.kernels.xlsx_build import build_xlsx
        from ocr_search_spark.kernels.xlsx_extract import xlsx_to_text

        def render(v):
            if v is None:
                return ""
            if isinstance(v, bool):
                return str(v)
            return str(v)

        parts = []
        for name, rows in sheets.items():
            # None trailing cells are skipped by the builder, so the
            # dense width is the max index of any non-None cell + 1
            width = 0
            for r in rows:
                for i, v in enumerate(r):
                    if v is not None:
                        width = max(width, i + 1)
            tsv = "".join(
                "\t".join(
                    (render(r[i]) if i < len(r) else "") for i in range(width)
                )
                + "\n"
                for r in rows
            )
            parts.append(f"=== Лист: {name} ===")
            parts.append(tsv)
        want = "\n\n".join(parts).strip()
        assert xlsx_to_text(build_xlsx(sheets)) == want
