"""Faithful Double Metaphone (Lawrence Philips, C/C++ Users Journal,
June 2000) — primary + secondary codes.

The reference delegates to the public ``metaphone`` PyPI package
(``/root/reference/ftm_columnstore/phonetic.py:9,46-47``):
``doublemetaphone(value)`` → ``(primary, secondary)`` where *secondary*
is ``""`` when it would equal *primary*, and codes are **not** truncated
to 4 characters (the package, unlike the original C++, runs to the end
of the word).  This module re-implements the published algorithm with
the same contract so blocking keys (fpx tables) match the reference
byte-for-byte for ascii names.

Inputs in the fpx pipeline are fingerprinted first (lower-cased,
de-accented ascii), so the rare non-ascii branches (Ç, Ñ) are kept for
API completeness but rarely fire.

This is a clean-room expression of the published rule set; structure
follows the algorithm's specification (one branch per consonant class),
which is inherently similar across every public port.
"""

from __future__ import annotations

VOWELS = frozenset("AEIOUY")


def _slavo_germanic(s: str) -> bool:
    return ("W" in s) or ("K" in s) or ("CZ" in s) or ("WITZ" in s)


class _DM:
    """One encoding run. ``self.s`` is the upper-cased word; all index
    helpers treat out-of-range as a mismatch/non-vowel."""

    __slots__ = ("s", "n", "last", "pri", "sec", "i", "sg")

    def __init__(self, word: str) -> None:
        self.s = word.upper()
        self.n = len(self.s)
        self.last = self.n - 1
        self.pri: list[str] = []
        self.sec: list[str] = []
        self.i = 0
        self.sg = _slavo_germanic(self.s)

    # --- helpers ---------------------------------------------------------
    def ch(self, pos: int) -> str:
        """Char at *pos*: the published algorithm right-pads with spaces
        (end-of-word reads ``" "``); out-of-range on the left yields a
        sentinel that can never match a rule set (avoids Python's
        ``"" in "AO"`` substring pitfall)."""
        if pos < 0:
            return "\0"
        return self.s[pos] if pos < self.n else " "

    def at(self, pos: int, length: int, *cands: str) -> bool:
        if pos < 0:
            return False
        return (self.s[pos : pos + length] + " " * 5)[:length] in cands

    def vowel(self, pos: int) -> bool:
        return self.ch(pos) in VOWELS

    def add(self, p: str, s: str | None = None) -> None:
        self.pri.append(p)
        self.sec.append(p if s is None else s)

    # --- main loop -------------------------------------------------------
    def encode(self) -> tuple[str, str]:
        s = self.s
        # silent initial letters
        if self.at(0, 2, "GN", "KN", "PN", "WR", "PS"):
            self.i = 1
        # initial X → 'S' (e.g. "Xavier")
        elif self.ch(0) == "X":
            self.add("S")
            self.i = 1

        while self.i < self.n:
            c = s[self.i]
            if c in VOWELS:
                if self.i == 0:
                    self.add("A")
                self.i += 1
            elif c == "B":
                self.add("P")
                self.i += 2 if self.ch(self.i + 1) == "B" else 1
            elif c == "\xc7":  # Ç
                self.add("S")
                self.i += 1
            elif c == "C":
                self._c()
            elif c == "D":
                if self.at(self.i, 2, "DG"):
                    if self.ch(self.i + 2) in "IEY":
                        self.add("J")  # "edge"
                        self.i += 3
                    else:
                        self.add("TK")  # "edgar"
                        self.i += 2
                elif self.at(self.i, 2, "DT", "DD"):
                    self.add("T")
                    self.i += 2
                else:
                    self.add("T")
                    self.i += 1
            elif c == "F":
                self.add("F")
                self.i += 2 if self.ch(self.i + 1) == "F" else 1
            elif c == "G":
                self._g()
            elif c == "H":
                # keep if initial or between two vowels
                if (self.i == 0 or self.vowel(self.i - 1)) and self.vowel(
                    self.i + 1
                ):
                    self.add("H")
                    self.i += 2
                else:
                    self.i += 1
            elif c == "J":
                self._j()
            elif c == "K":
                self.add("K")
                self.i += 2 if self.ch(self.i + 1) == "K" else 1
            elif c == "L":
                if self.ch(self.i + 1) == "L":
                    # spanish "cabrillo", "gallegos"
                    if (
                        self.i == self.n - 3
                        and self.at(self.i - 1, 4, "ILLO", "ILLA", "ALLE")
                    ) or (
                        (
                            self.at(self.last - 1, 2, "AS", "OS")
                            or self.ch(self.last) in "AO"
                        )
                        and self.at(self.i - 1, 4, "ALLE")
                    ):
                        self.add("L", "")
                        self.i += 2
                    else:
                        self.add("L")
                        self.i += 2
                else:
                    self.add("L")
                    self.i += 1
            elif c == "M":
                self.add("M")
                if (
                    self.at(self.i - 1, 3, "UMB")
                    and (
                        self.i + 1 == self.last
                        or self.at(self.i + 2, 2, "ER")
                    )
                ) or self.ch(self.i + 1) == "M":
                    self.i += 2
                else:
                    self.i += 1
            elif c == "N":
                self.add("N")
                self.i += 2 if self.ch(self.i + 1) == "N" else 1
            elif c == "\xd1":  # Ñ
                self.add("N")
                self.i += 1
            elif c == "P":
                if self.ch(self.i + 1) == "H":
                    self.add("F")
                    self.i += 2
                else:
                    self.add("P")
                    self.i += 2 if self.ch(self.i + 1) in "PB" else 1
            elif c == "Q":
                self.add("K")
                self.i += 2 if self.ch(self.i + 1) == "Q" else 1
            elif c == "R":
                # french e.g. "rogier", but not "hochmeier"
                if (
                    self.i == self.last
                    and not self.sg
                    and self.at(self.i - 2, 2, "IE")
                    and not self.at(self.i - 4, 2, "ME", "MA")
                ):
                    self.add("", "R")
                else:
                    self.add("R")
                self.i += 2 if self.ch(self.i + 1) == "R" else 1
            elif c == "S":
                self._s()
            elif c == "T":
                self._t()
            elif c == "V":
                self.add("F")
                self.i += 2 if self.ch(self.i + 1) == "V" else 1
            elif c == "W":
                self._w()
            elif c == "X":
                # french e.g. "breaux"
                if not (
                    self.i == self.last
                    and (
                        self.at(self.i - 3, 3, "IAU", "EAU")
                        or self.at(self.i - 2, 2, "AU", "OU")
                    )
                ):
                    self.add("KS")
                self.i += 2 if self.ch(self.i + 1) in "CX" else 1
            elif c == "Z":
                if self.ch(self.i + 1) == "H":
                    # chinese pinyin e.g. "zhao"
                    self.add("J")
                    self.i += 2
                else:
                    if self.at(self.i + 1, 2, "ZO", "ZI", "ZA") or (
                        self.sg and self.i > 0 and self.ch(self.i - 1) != "T"
                    ):
                        self.add("S", "TS")
                    else:
                        self.add("S")
                    self.i += 2 if self.ch(self.i + 1) == "Z" else 1
            else:
                self.i += 1

        primary = "".join(self.pri)
        secondary = "".join(self.sec)
        if secondary == primary:
            secondary = ""
        return primary, secondary

    # --- per-letter branches ---------------------------------------------
    def _c(self) -> None:
        i = self.i
        # various germanic ("ach" with a preceding consonant)
        if (
            i > 1
            and not self.vowel(i - 2)
            and self.at(i - 1, 3, "ACH")
            and (
                self.ch(i + 2) != "I"
                and (
                    self.ch(i + 2) != "E"
                    or self.at(i - 2, 6, "BACHER", "MACHER")
                )
            )
        ):
            self.add("K")
            self.i += 2
            return
        # special case "caesar"
        if i == 0 and self.at(i, 6, "CAESAR"):
            self.add("S")
            self.i += 2
            return
        # italian "chianti"
        if self.at(i, 4, "CHIA"):
            self.add("K")
            self.i += 2
            return
        if self.at(i, 2, "CH"):
            # "michael"
            if i > 0 and self.at(i, 4, "CHAE"):
                self.add("K", "X")
                self.i += 2
                return
            # greek roots e.g. "chemistry", "chorus"
            if (
                i == 0
                and (
                    self.at(i + 1, 5, "HARAC", "HARIS")
                    or self.at(i + 1, 3, "HOR", "HYM", "HIA", "HEM")
                )
                and not self.at(0, 5, "CHORE")
            ):
                self.add("K")
                self.i += 2
                return
            # germanic, greek, or otherwise 'ch' as 'kh'
            if (
                self.at(0, 4, "VAN ", "VON ")
                or self.at(0, 3, "SCH")
                # "architect" but not "arch", "orchestra", "orchid"
                or self.at(i - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
                or self.ch(i + 2) in ("T", "S")
                or (
                    (self.ch(i - 1) in "AOUE" or i == 0)
                    # "wachtler", "wechsler", but not "tichner"
                    and (
                        self.ch(i + 2) in "LRNMBHFVW "
                        or i + 2 >= self.n
                    )
                )
            ):
                self.add("K")
            else:
                if i > 0:
                    if self.at(0, 2, "MC"):
                        self.add("K")  # "McHugh"
                    else:
                        self.add("X", "K")
                else:
                    self.add("X")
            self.i += 2
            return
        # "czerny"
        if self.at(i, 2, "CZ") and not self.at(i - 2, 4, "WICZ"):
            self.add("S", "X")
            self.i += 2
            return
        # "focaccia"
        if self.at(i + 1, 3, "CIA"):
            self.add("X")
            self.i += 3
            return
        # double 'C' but not "McClellan"
        if self.at(i, 2, "CC") and not (i == 1 and self.ch(0) == "M"):
            if self.ch(i + 2) in "IEH" and not self.at(i + 2, 2, "HU"):
                # "accident", "accede", "succeed"
                if (i == 1 and self.ch(0) == "A") or self.at(
                    i - 1, 5, "UCCEE", "UCCES"
                ):
                    self.add("KS")
                else:
                    # "bacci", "bertucci"
                    self.add("X")
                self.i += 3
                return
            # "bacchus"
            self.add("K")
            self.i += 2
            return
        if self.at(i, 2, "CK", "CG", "CQ"):
            self.add("K")
            self.i += 2
            return
        if self.at(i, 2, "CI", "CE", "CY"):
            # italian vs. english
            if self.at(i, 3, "CIO", "CIE", "CIA"):
                self.add("S", "X")
            else:
                self.add("S")
            self.i += 2
            return
        self.add("K")
        # "mac caffrey", "mac gregor"
        if self.at(i + 1, 2, " C", " Q", " G"):
            self.i += 3
        elif self.ch(i + 1) in "CKQ" and not self.at(i + 1, 2, "CE", "CI"):
            self.i += 2
        else:
            self.i += 1

    def _g(self) -> None:
        i = self.i
        nxt = self.ch(i + 1)
        if nxt == "H":
            if i > 0 and not self.vowel(i - 1):
                self.add("K")
                self.i += 2
                return
            if i == 0:
                # "ghislane", "ghiradelli"
                if self.ch(i + 2) == "I":
                    self.add("J")
                else:
                    self.add("K")
                self.i += 2
                return
            # Parker's rule (with further refinements): "hugh"
            if (
                (i > 1 and self.ch(i - 2) in "BHD")
                # "bough"
                or (i > 2 and self.ch(i - 3) in "BHD")
                # "broughton"
                or (i > 3 and self.ch(i - 4) in "BH")
            ):
                self.i += 2
                return
            # "laugh", "McLaughlin", "cough", "gough", "rough", "tough"
            if (
                i > 2
                and self.ch(i - 1) == "U"
                and self.ch(i - 3) in "CGLRT"
            ):
                self.add("F")
            elif i > 0 and self.ch(i - 1) != "I":
                self.add("K")
            self.i += 2
            return
        if nxt == "N":
            if i == 1 and self.vowel(0) and not self.sg:
                self.add("KN", "N")
            # not "cagney"
            elif (
                not self.at(i + 2, 2, "EY")
                and self.ch(i + 1) != "Y"
                and not self.sg
            ):
                self.add("N", "KN")
            else:
                self.add("KN")
            self.i += 2
            return
        # "tagliaro"
        if self.at(i + 1, 2, "LI") and not self.sg:
            self.add("KL", "L")
            self.i += 2
            return
        # -ges-, -gep-, -gel-, -gie- at beginning
        if i == 0 and (
            nxt == "Y"
            or self.at(
                i + 1,
                2,
                "ES",
                "EP",
                "EB",
                "EL",
                "EY",
                "IB",
                "IL",
                "IN",
                "IE",
                "EI",
                "ER",
            )
        ):
            self.add("K", "J")
            self.i += 2
            return
        # -ger-, -gy-
        if (
            (self.at(i + 1, 2, "ER") or nxt == "Y")
            and not self.at(0, 6, "DANGER", "RANGER", "MANGER")
            and self.ch(i - 1) not in "EI"
            and not self.at(i - 1, 3, "RGY", "OGY")
        ):
            self.add("K", "J")
            self.i += 2
            return
        # italian e.g. "biaggi"
        if nxt in "EIY" or self.at(i - 1, 4, "AGGI", "OGGI"):
            # obvious germanic
            if (
                self.at(0, 4, "VAN ", "VON ")
                or self.at(0, 3, "SCH")
                or self.at(i + 1, 2, "ET")
            ):
                self.add("K")
            elif self.at(i + 1, 4, "IER "):
                self.add("J")
            else:
                self.add("J", "K")
            self.i += 2
            return
        self.add("K")
        self.i += 2 if nxt == "G" else 1

    def _j(self) -> None:
        i = self.i
        # "jose", "san jacinto"
        if self.at(i, 4, "JOSE") or self.at(0, 4, "SAN "):
            if (i == 0 and self.ch(i + 4) == " ") or self.at(0, 4, "SAN "):
                self.add("H")
            else:
                self.add("J", "H")
            self.i += 1
            return
        if i == 0 and not self.at(i, 4, "JOSE"):
            # "Yankelovich" vs "Jankelowicz"
            self.add("J", "A")
        elif (
            self.vowel(i - 1)
            and not self.sg
            and self.ch(i + 1) in "AO"
        ):
            # spanish "bajador"
            self.add("J", "H")
        elif i == self.last:
            self.add("J", "")
        elif self.ch(i + 1) not in "LTKSNMBZ" and self.ch(i - 1) not in "SKL":
            self.add("J")
        self.i += 2 if self.ch(i + 1) == "J" else 1

    def _s(self) -> None:
        i = self.i
        # silent: "island", "isle", "carlisle"
        if self.at(i - 1, 3, "ISL", "YSL"):
            self.i += 1
            return
        # "sugar"
        if i == 0 and self.at(i, 5, "SUGAR"):
            self.add("X", "S")
            self.i += 1
            return
        if self.at(i, 2, "SH"):
            # germanic
            if self.at(i + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
                self.add("S")
            else:
                self.add("X")
            self.i += 2
            return
        # italian & armenian
        if self.at(i, 3, "SIO", "SIA") or self.at(i, 4, "SIAN"):
            if not self.sg:
                self.add("S", "X")
            else:
                self.add("S")
            self.i += 3
            return
        # german & anglicization: "smith" / "schmidt", "snider" / "schneider"
        if (i == 0 and self.ch(i + 1) in "MNLW") or self.ch(i + 1) == "Z":
            self.add("S", "X")
            self.i += 2 if self.ch(i + 1) == "Z" else 1
            return
        if self.at(i, 2, "SC"):
            if self.ch(i + 2) == "H":
                # "schermerhorn", "schenker"
                if self.at(i + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM"):
                    if self.at(i + 3, 2, "ER", "EN"):
                        self.add("X", "SK")
                    else:
                        self.add("SK")
                    self.i += 3
                    return
                if i == 0 and not self.vowel(3) and self.ch(3) != "W":
                    self.add("X", "S")
                else:
                    self.add("X")
                self.i += 3
                return
            if self.ch(i + 2) in "IEY":
                self.add("S")
                self.i += 3
                return
            self.add("SK")
            self.i += 3
            return
        # french e.g. "resnais", "artois"
        if i == self.last and self.at(i - 2, 2, "AI", "OI"):
            self.add("", "S")
        else:
            self.add("S")
        self.i += 2 if self.ch(i + 1) in "SZ" else 1

    def _t(self) -> None:
        i = self.i
        if self.at(i, 4, "TION"):
            self.add("X")
            self.i += 3
            return
        if self.at(i, 3, "TIA", "TCH"):
            self.add("X")
            self.i += 3
            return
        if self.at(i, 2, "TH") or self.at(i, 3, "TTH"):
            # special case "thomas", "thames" or germanic
            if (
                self.at(i + 2, 2, "OM", "AM")
                or self.at(0, 4, "VAN ", "VON ")
                or self.at(0, 3, "SCH")
            ):
                self.add("T")
            else:
                self.add("0", "T")
            self.i += 2
            return
        self.add("T")
        self.i += 2 if self.ch(i + 1) in "TD" else 1

    def _w(self) -> None:
        i = self.i
        # can also be in the middle of a word
        if self.at(i, 2, "WR"):
            self.add("R")
            self.i += 2
            return
        if i == 0 and (self.vowel(i + 1) or self.at(i, 2, "WH")):
            # "Wasserman" should match "Vasserman"
            if self.vowel(i + 1):
                self.add("A", "F")
            else:
                # "Uomo" should match "Womo"
                self.add("A")
            self.i += 1
            return
        # "Arnow" should match "Arnoff"
        if (
            (i == self.last and self.vowel(i - 1))
            or self.at(i - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY")
            or self.at(0, 3, "SCH")
        ):
            self.add("", "F")
            self.i += 1
            return
        # polish e.g. "Filipowicz"
        if self.at(i, 4, "WICZ", "WITZ"):
            self.add("TS", "FX")
            self.i += 4
            return
        self.i += 1


def double_metaphone(value: str) -> tuple[str, str]:
    """Encode *value* → ``(primary, secondary)``; ``secondary == ""``
    when identical to primary (the ``metaphone`` package contract the
    reference consumes at ``phonetic.py:46-47``)."""
    if not value:
        return ("", "")
    return _DM(value.strip()).encode()
