"""RTF text extraction (operator E13).

Replicates the observable contract of the reference's ``RTFExtractor``
(reference: app/services/extractors/rtf.py:18-48): decode, strip RTF control
words/groups, keep visible text. The reference delegates to the
``striprtf`` library; this is an independent minimal RTF-to-text state
machine covering the constructs our corpus and tests emit:

* control words (``\\word[N]``) dropped; ``\\par``/``\\line`` → newline,
  ``\\tab`` → tab;
* destination groups (``{\\fonttbl ...}``, ``{\\*\\...}``) dropped whole;
* hex escapes ``\\'xx`` decoded (cp1251 — the reference decodes Russian RTF);
* unicode escapes ``\\uN`` decoded with the following fallback char skipped;
* escaped braces/backslash kept literal.
"""

from __future__ import annotations

import re

#: next structurally-significant character: group braces, control-word
#: backslash, or the raw CR/LF the format ignores — everything between
#: two of these is a plain-text run emitted in one slice (the per-char
#: emit loop this replaces was the function's hot path, r6)
_SPECIAL_RE = re.compile(r"[{}\\\r\n]")

#: destination groups whose content is invisible
_DROP_DESTINATIONS = {
    "fonttbl", "colortbl", "stylesheet", "info", "header", "footer",
    "pict", "object", "themedata",
}


def rtf_to_text(rtf: str) -> str:
    if not rtf or not rtf.startswith("{\\rtf"):
        return ""
    out: list[str] = []
    i, n = 0, len(rtf)
    # stack of booleans: is the current group a dropped destination?
    drop_stack: list[bool] = []
    dropping = 0

    def emit(ch: str) -> None:
        if not dropping:
            out.append(ch)

    while i < n:
        c = rtf[i]
        if c == "{":
            # peek for destination group
            j = i + 1
            starred = rtf.startswith("\\*", j)
            k = j + 2 if starred else j
            dest = False
            if rtf.startswith("\\", k):
                m = k + 1
                while m < n and rtf[m].isalpha():
                    m += 1
                word = rtf[k + 1 : m]
                dest = starred or word in _DROP_DESTINATIONS
            drop_stack.append(dest)
            dropping += int(dest)
            i += 1
        elif c == "}":
            if drop_stack:
                dropping -= int(drop_stack.pop())
            i += 1
        elif c == "\\":
            if i + 1 >= n:
                break
            nxt = rtf[i + 1]
            if nxt in "{}\\":
                emit(nxt)
                i += 2
            elif nxt == "'":
                if i + 3 < n:
                    try:
                        emit(bytes([int(rtf[i + 2 : i + 4], 16)]).decode("cp1251"))
                    except ValueError:
                        pass
                i += 4
            elif nxt == "u":
                j = i + 2
                sign = 1
                if j < n and rtf[j] == "-":
                    sign, j = -1, j + 1
                m = j
                while m < n and rtf[m].isdigit():
                    m += 1
                if m > j:
                    cp = sign * int(rtf[j:m])
                    emit(chr(cp + 65536 if cp < 0 else cp))
                    if m < n and rtf[m] == "?":  # fallback char
                        m += 1
                i = m
            else:
                m = i + 1
                while m < n and rtf[m].isalpha():
                    m += 1
                word = rtf[i + 1 : m]
                while m < n and (rtf[m].isdigit() or rtf[m] == "-"):
                    m += 1
                if m < n and rtf[m] == " ":  # delimiter space is consumed
                    m += 1
                if word in ("par", "line"):
                    emit("\n")
                elif word == "tab":
                    emit("\t")
                i = m
        elif c in "\r\n":
            i += 1
        else:
            # plain-text run: jump to the next special char in one scan
            m = _SPECIAL_RE.search(rtf, i + 1)
            end = m.start() if m else n
            if not dropping:
                out.append(rtf[i:end])
            i = end
    return "".join(out).strip()
