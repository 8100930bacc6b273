"""Adobe Glyph List (AGL) subset, vendored as a module constant.

The reference rebuilds a ~590-entry dict on EVERY call
(/root/reference/_utils.py:288-290) and falls back to fetching the full
AGL over HTTP at runtime (toUnicode.py:471-476). Neither survives a
1000-executor cluster: this table is built ONCE at import from public
AGL naming rules (most names derive mechanically from Unicode character
names) plus an explicit irregulars table, and is shipped with the wheel.
`uniXXXX`/`uXXXXXX` forms are decoded algorithmically per the public AGL
specification.
"""

from __future__ import annotations

import re
import unicodedata
from typing import Dict, Optional

_UNI = re.compile(r"^uni([0-9A-Fa-f]{4})$")
_U = re.compile(r"^u([0-9A-Fa-f]{4,6})$")


def _build() -> Dict[str, str]:
    g: Dict[str, str] = {}
    # ASCII letters name themselves
    for c in "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz":
        g[c] = c
    # digits and ASCII punctuation by AGL name
    for name, ch in {
        "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
        "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
        "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
        "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
        "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
        "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
        "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
        "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
        "backslash": "\\", "bracketright": "]", "asciicircum": "^",
        "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
        "braceright": "}", "asciitilde": "~",
    }.items():
        g[name] = ch
    # accented Latin letters: AGL name = letter + accent suffix, and the
    # Unicode name is "LATIN <case> LETTER <X> WITH <ACCENT>"
    accents = {
        "acute": "ACUTE", "grave": "GRAVE", "circumflex": "CIRCUMFLEX",
        "dieresis": "DIAERESIS", "tilde": "TILDE", "ring": "RING ABOVE",
        "cedilla": "CEDILLA", "caron": "CARON", "breve": "BREVE",
        "macron": "MACRON", "ogonek": "OGONEK", "dotaccent": "DOT ABOVE",
        "hungarumlaut": "DOUBLE ACUTE", "slash": "STROKE",
    }
    for base in "abcdefghijklmnopqrstuvwxyz":
        for suffix, uaccent in accents.items():
            for case, letter in (("SMALL", base), ("CAPITAL", base)):
                try:
                    ch = unicodedata.lookup(
                        f"LATIN {case} LETTER {base.upper()} WITH {uaccent}"
                    )
                except KeyError:
                    continue
                name = (base if case == "SMALL" else base.upper()) + suffix
                g.setdefault(name, ch)
    # Greek letters: AGL name is the lowercase Unicode short name
    for uname in (
        "ALPHA BETA GAMMA DELTA EPSILON ZETA ETA THETA IOTA KAPPA LAMDA MU "
        "NU XI OMICRON PI RHO SIGMA TAU UPSILON PHI CHI PSI OMEGA"
    ).split():
        agl = {"LAMDA": "lambda"}.get(uname, uname.lower())
        try:
            g.setdefault(agl, unicodedata.lookup(f"GREEK SMALL LETTER {uname}"))
            g.setdefault(
                agl.capitalize() if agl != "lambda" else "Lambda",
                unicodedata.lookup(f"GREEK CAPITAL LETTER {uname}"),
            )
        except KeyError:
            pass
    # irregulars & typographic specials (public AGL entries)
    g.update(
        {
            "quoteright": "’", "quoteleft": "‘", "quotedblleft": "“",
            "quotedblright": "”", "quotesinglbase": "‚", "quotedblbase": "„",
            "endash": "–", "emdash": "—", "bullet": "•", "dagger": "†",
            "daggerdbl": "‡", "ellipsis": "…", "perthousand": "‰",
            "fi": "ﬁ", "fl": "ﬂ", "germandbls": "ß", "ae": "æ", "AE": "Æ",
            "oe": "œ", "OE": "Œ", "oslash": "ø", "Oslash": "Ø",
            "lslash": "ł", "Lslash": "Ł", "dotlessi": "ı", "florin": "ƒ",
            "fraction": "⁄", "guillemotleft": "«", "guillemotright": "»",
            "guilsinglleft": "‹", "guilsinglright": "›", "exclamdown": "¡",
            "questiondown": "¿", "cent": "¢", "sterling": "£", "yen": "¥",
            "currency": "¤", "section": "§", "paragraph": "¶",
            "periodcentered": "·", "degree": "°", "plusminus": "±",
            "multiply": "×", "divide": "÷", "copyright": "©",
            "registered": "®", "trademark": "™", "Euro": "€", "euro": "€",
            "brokenbar": "¦", "mu": "µ", "middot": "·", "nbspace": " ",
            "onequarter": "¼", "onehalf": "½", "threequarters": "¾",
            "onesuperior": "¹", "twosuperior": "²", "threesuperior": "³",
            "ordfeminine": "ª", "ordmasculine": "º", "macron": "¯",
            "acute": "´", "dieresis": "¨", "cedilla": "¸", "logicalnot": "¬",
            "Thorn": "Þ", "thorn": "þ", "Eth": "Ð", "eth": "ð",
            "minus": "−", "asciitilde": "~", "tilde": "˜",
            "circumflex": "ˆ", "caron": "ˇ", "breve": "˘",
            "dotaccent": "˙", "ring": "˚", "ogonek": "˛",
            "hungarumlaut": "˝", "apple": "", ".notdef": "",
        }
    )
    return g


GLYPH_TO_UNICODE: Dict[str, str] = _build()


def glyph_to_unicode(name: str) -> Optional[str]:
    """Glyph name -> unicode (parity: glyph2unicode, _utils.py:288-882,
    but O(1) against a frozen module-level table)."""
    if name.startswith("/"):
        name = name[1:]
    hit = GLYPH_TO_UNICODE.get(name)
    if hit is not None:
        return hit
    m = _UNI.match(name)
    if m:
        return chr(int(m.group(1), 16))
    m = _U.match(name)
    if m:
        cp = int(m.group(1), 16)
        if cp <= 0x10FFFF:
            return chr(cp)
    # "gXX" / "cidXX" style and unknowns -> None (caller decides fallback)
    return None
