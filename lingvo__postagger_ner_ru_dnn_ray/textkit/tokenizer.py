"""Char-FSM tokenizer — the *Simple* (sentence-API) variant.

Behavioral re-implementation of the reference Tokenizer's
SentSplitterProcessSentCallback_Simple path
(/root/reference/PosTagger/Lingvo.PosTagger.Tokenizing/Tokenizing/Tokenizer.cs):

  * main/tail scan regions split at the last letter-or-digit, with the
    keep-dot-after-single-capital quirk (SkipNonLetterAndNonDigitToTheEnd,
    :985-1012)
  * a dot is always detached unless followed by a digit (:732-744)
  * '&' '_' soft-hyphen '‒' '―' '‘' '‛' kept between letters/digits; true
    hyphens always split (:747-788, IsBetweenLetterOrDigit :1014-1046)
  * '"' ',' ':' '〃' kept between digits (IsBetweenDigit :1047-1079)
  * ~50 chars always tokenized separately (UnsafeConst table :101-145)
  * runs of the same punctuation char merge, incl. interior whitespace
    (MergePunctuation :1131-1171)
  * digits+punctuation tokens (incl. unit suffixes г/кг/см/км/тыс/млн)
    collapse to the [%NUM%] placeholder; consecutive number words collapse
    into one (:887-936, IsDigits_WithPunctuations_WithSpecEnds :1193-1211)
  * single-char exotic punctuation canonicalized (Clear_valueOriginal
    :1213-1278)
  * URL spans re-enter the word list sorted by startIndex (:314-351)

Pure function of text + static LUTs: run as stateless Ray tasks; the LUTs
are module-level singletons built once per worker process.
"""
from __future__ import annotations

from typing import NamedTuple

from . import xlat
from .features import (
    EX_HAS_UMLAUTES,
    EX_INTEGER_NUMBER,
    EX_PUNCTUATION,
    IT_EMAIL,
    IT_NUM,
    IT_URL,
    get_input_type,
    normalize_umlautes,
)
from .resources import DIGITS_SPEC_ENDS, NUM_PLACEHOLDER
from .sentsplit import Sent, split_sents_simple
from .urls import EMAIL, UrlSpan, allocate_urls

_CT = xlat.CHARTYPE_L          # scalar per-char path (list: faster indexing)
_SP = xlat.SPECTYPE_L
_UP = xlat.UPPER_INVARIANT_L
_UPN = xlat.UPPER_INVARIANT    # vectorized path

_WS = xlat.IS_WHITESPACE
_LD = xlat.IS_LETTER | xlat.IS_DIGIT

_KEEP_PUNCT_1 = frozenset(ord(c) for c in ":.,;?!()/%&…")
_KEEP_QUOTE_1 = frozenset(ord(c) for c in "\"'[]")


class Word:
    __slots__ = ("value", "upper", "start", "length", "input_type", "extra", "upper_umlauts")

    def __init__(self, value, upper, start, length, input_type, extra, upper_umlauts=None):
        self.value = value
        self.upper = upper
        self.start = start
        self.length = length
        self.input_type = input_type
        self.extra = extra
        self.upper_umlauts = upper_umlauts

    def __repr__(self):  # pragma: no cover
        return f"Word({self.value!r}@{self.start}+{self.length},it={self.input_type},ex={self.extra})"


# Token-intern cache: every derived attribute of a token (canonical value,
# upper form, input type, flags) is a pure function of its code units, and
# token frequency is Zipfian — one dict probe replaces two string builds +
# the per-char feature scan for every repeated token. Per-worker, bounded.
_TOKEN_MEMO: dict[bytes, tuple] = {}
_TOKEN_MEMO_MAX = 1_000_000


class _SentTokenizer:
    __slots__ = (
        "u", "ul", "ub", "n", "s", "end", "words", "start_index", "cur_len",
        "is_prev_num", "last_num", "replace_nums", "dot_variant", "cts", "sps",
        "itp", "nxt",
    )

    def __init__(self, u16, replace_nums: bool, dot_variant: str = "simple",
                 input_type_processor=None):
        import numpy as np

        self.u = u16
        self.ul = u16.tolist()  # per-char access path
        self.ub = u16.tobytes()  # bytes-slice memo keys (2 bytes per unit)
        # one vectorized LUT gather per text replaces two Python LUT
        # indexes per character inside the scan loops
        ct_arr = xlat.CHARTYPE[u16]
        sp_arr = xlat.SPECTYPE[u16]
        self.cts = ct_arr.tolist()
        self.sps = sp_arr.tolist()
        n = len(u16)
        # nxt[i] = smallest j >= i whose char the FSM must inspect
        # (whitespace or any SPECTYPE flag); plain letter/digit runs in
        # between are consumed in one jump instead of one loop iteration
        # per character — the scan loop is the fused stage's hottest
        # Python after the round-3 inference rewrite
        if n:
            idx = np.where(((ct_arr & _WS) != 0) | (sp_arr != 0),
                           np.arange(n, dtype=np.int64), n)
            self.nxt = np.minimum.accumulate(idx[::-1])[::-1].tolist()
        else:
            self.nxt = []
        self.n = n
        self.replace_nums = replace_nums
        # "simple": always unstick dots (WebService path, Tokenizer.cs:732-744)
        # "console": keep a dot in the word; flush immediately when the next
        #            char is uppercase (batch path, Tokenizer.cs:491-497)
        self.dot_variant = dot_variant
        # pluggable graphemic classifier — the IPosTaggerInputTypeProcessor
        # config slot (TokenizerConfig.cs:20); None = the default _En port
        self.itp = input_type_processor

    def ch(self, i: int) -> int:
        return self.ul[i] if 0 <= i < self.n else 0

    # -- IsDigits_WithPunctuations_WithSpecEnds (Tokenizer.cs:1193-1211) --
    def _is_num_token(self, start: int, length: int) -> bool:
        has_digits = False
        ul = self.ul
        cts = self.cts
        for k in range(start, start + length):
            ct = cts[k]
            if ct & xlat.IS_DIGIT:
                has_digits = True
                continue
            if not (ct & xlat.IS_PUNCTUATION):
                if has_digits:
                    end = "".join(chr(_UP[ul[j]]) for j in range(k, start + length))
                    return end in DIGITS_SPEC_ENDS
                return False
        return has_digits

    # -- TryCreateWordAndPut2List (Tokenizer.cs:897-983) --
    def _try_create(self) -> None:
        if self.cur_len == 0:
            return
        start, length = self.start_index, self.cur_len
        if self.replace_nums:
            if self._is_num_token(start, length):
                if not self.is_prev_num:
                    self.is_prev_num = True
                    w = Word(NUM_PLACEHOLDER, NUM_PLACEHOLDER, start, length, IT_NUM, EX_INTEGER_NUMBER)
                    self.last_num = w
                    self.words.append(w)
                self.start_index += length
                self.cur_len = 0
                return
            if self.last_num is not None:
                i = 1
                ln = start - self.last_num.start
                while i < ln:
                    if not (_CT[self.ch(start - i)] & _WS):
                        break
                    i += 1
                self.last_num.length = start - self.last_num.start - i + 1
                self.last_num = None
            self.is_prev_num = False

        key = self.ub[2 * start : 2 * (start + length)]
        # the shared memo is only valid for the default processor — a
        # custom input_type_processor computes uncached
        hit = _TOKEN_MEMO.get(key) if self.itp is None else None
        if hit is None:
            value = key.decode(xlat._ENC, "surrogatepass")
            upper = xlat.from_u16(_UPN[self.u[start : start + length]], 0, length)
            input_type, extra = (self.itp or get_input_type)(self.ul, start, length)
            upper_uml = normalize_umlautes(upper, upper=True) if extra & EX_HAS_UMLAUTES else None
            value = _clear_value_original(value, extra, self.u, start, length)
            hit = (value, upper, input_type, extra, upper_uml)
            if self.itp is None:
                if len(_TOKEN_MEMO) > _TOKEN_MEMO_MAX:
                    _TOKEN_MEMO.clear()
                _TOKEN_MEMO[key] = hit
        value, upper, input_type, extra, upper_uml = hit
        self.words.append(Word(value, upper, start, length, input_type, extra, upper_uml))
        self.start_index += length
        self.cur_len = 0

    # -- MergePunctuation (Tokenizer.cs:1131-1171); returns (ok, new_i) --
    def _merge_punct(self, i: int, begin_ch: int, end: int) -> tuple[bool, int]:
        self.cur_len = 1
        i += 1
        ws_len = 0
        ul, cts, sps = self.ul, self.cts, self.sps
        while i <= end:
            if cts[i] & _WS:
                ws_len += 1
                i += 1
                continue
            if sps[i] & xlat.SP_INTERPRETE_AS_WHITESPACE:
                ws_len += 1
                i += 1
                continue
            if ul[i] == begin_ch:
                self.cur_len += ws_len + 1
                ws_len = 0
                i += 1
                continue
            break
        if i > end:
            if self.cur_len == 1 and self.ch(end) == 0:
                self.cur_len = 0
            return False, i
        return True, i - ws_len - 1

    # -- SkipNonLetterAndNonDigitToTheEnd (Tokenizer.cs:985-1012) --
    def _trim_end(self, s: int, e0: int) -> int:
        ptr = e0
        cts = self.cts
        while ptr >= s:
            ct = cts[ptr]
            if ct & _LD:
                if ct & xlat.IS_UPPER:
                    p = ptr - 1
                    if p == s or (p > s and ((_CT[self.ch(p)]) & _WS)):
                        p = ptr + 1
                        if p == e0 or (p < e0 and ((_CT[self.ch(p + 1)]) & _WS)):
                            if xlat.is_dot(self.ch(p)):
                                return p
                return ptr
            ptr -= 1
        return s - 1

    def tokenize(self, sent: Sent) -> list[Word]:
        self.words = []
        self.is_prev_num = False
        self.last_num = None
        s = sent.start
        self.start_index = s
        self.cur_len = 0
        realy_end = s + sent.length - 1

        urls = sent.urls
        url_idx = 0
        next_url_start = urls[0].start if urls else 1 << 60

        end = self._trim_end(s, realy_end)

        ul, cts, sps, nxt = self.ul, self.cts, self.sps, self.nxt
        i = s
        while i <= end:
            if next_url_start <= i:
                self._try_create()
                us = urls[url_idx]
                i = us.start + us.length - 1
                url_idx += 1
                next_url_start = urls[url_idx].start if url_idx < len(urls) else 1 << 60
                self.start_index = i + 1
                self.cur_len = 0
                i += 1
                continue

            # consume the whole plain letter/digit run to the next char the
            # FSM must inspect (capped at sentence end and the next URL)
            j = nxt[i]
            if j > i:
                if j > end + 1:
                    j = end + 1
                if j > next_url_start:
                    j = next_url_start
                self.cur_len += j - i
                i = j
                continue

            c = ul[i]
            ct = cts[i]
            if ct & _WS:
                self._try_create()
                self.start_index += 1
                i += 1
                continue

            sp = sps[i]
            if sp & xlat.SP_DOT:
                if self.dot_variant == "console":
                    # plain callback: dot accumulates; uppercase-next flushes
                    self.cur_len += 1
                    if self._is_upper_at(i + 1, end):
                        self._try_create()
                    i += 1
                    continue
                if not self._is_digit_at(i + 1, end):
                    self._try_create()
                    ok, i = self._merge_punct(i, c, end)
                    if not ok:
                        break
                    self._try_create()
                    i += 1
                    continue

            if sp & xlat.SP_BETWEEN_LETTER_OR_DIGIT:
                if not (ct & xlat.IS_HYPHEN) and self._is_between(i, s, end, _LD):
                    self.cur_len += 1
                else:
                    self._try_create()
                    ok, i = self._merge_punct(i, c, end)
                    if not ok:
                        break
                    self._try_create()
                i += 1
                continue
            if sp & xlat.SP_BETWEEN_DIGIT:
                if self._is_between(i, s, end, xlat.IS_DIGIT):
                    self.cur_len += 1
                else:
                    self._try_create()
                    ok, i = self._merge_punct(i, c, end)
                    if not ok:
                        break
                    self._try_create()
                i += 1
                continue

            if sp & xlat.SP_TOKENIZE_DIFFERENT_SEPARATELY:
                self._try_create()
                ok, i = self._merge_punct(i, c, end)
                if not ok:
                    break
                self._try_create()
                i += 1
                continue

            if sp & xlat.SP_INTERPRETE_AS_WHITESPACE:
                self._try_create()
                self.start_index += 1
                i += 1
                continue

            self.cur_len += 1
            i += 1

        self._try_create()

        # tail region: trailing non-letter/digit chars (Tokenizer.cs:829-879)
        while i <= realy_end:
            c = ul[i]
            ct = cts[i]
            if ct & _WS:
                self._try_create()
                self.start_index += 1
                i += 1
                continue
            sp = sps[i]
            if sp & xlat.SP_TOKENIZE_DIFFERENT_SEPARATELY:
                self._try_create()
                ok, i = self._merge_punct(i, c, realy_end)
                if not ok:
                    break
                self._try_create()
                i += 1
                continue
            if sp & xlat.SP_INTERPRETE_AS_WHITESPACE:
                self._try_create()
                self.start_index += 1
                i += 1
                continue
            self.cur_len += 1
            i += 1

        self._try_create()

        if urls:
            for us in urls:
                value = xlat.from_u16(self.u, us.start, us.length)
                it = IT_EMAIL if us.type == EMAIL else IT_URL
                self.words.append(Word(value, value, us.start, us.length, it, 0))
            self.words.sort(key=lambda w: w.start)
        return self.words

    def _is_digit_at(self, p: int, end: int) -> bool:
        if p > end:
            return False
        return bool(self.cts[p] & xlat.IS_DIGIT)

    def _is_upper_at(self, p: int, end: int) -> bool:
        # IsUpperNextChar (Tokenizer.cs:1080-1104)
        if p > end:
            return False
        return bool(self.cts[p] & xlat.IS_UPPER)

    def _is_between(self, i: int, s: int, end: int, mask: int) -> bool:
        if i <= s:
            return False
        if not (self.cts[i - 1] & mask):
            return False
        p = i + 1
        if p > end:
            return False
        return bool(self.cts[p] & mask)


def _clear_value_original(v: str, extra: int, u, start: int, length: int) -> str:
    # Clear_valueOriginal (Tokenizer.cs:1213-1278)
    if not (extra & EX_PUNCTUATION):
        return v
    if length == 1:
        c = ord(v[0])
        if c in _KEEP_PUNCT_1:
            return v
        ct = (_CT[c])
        if ct & xlat.IS_HYPHEN:
            return v if v == "-" else "-"
        if (ct & xlat.IS_QUOTE) == xlat.IS_QUOTE:
            return v if c in _KEEP_QUOTE_1 else '"'
        return v
    if v == "''":
        return '"'
    if v == ",,":
        return ","
    if v == "--":
        return "-"
    return v


def tokenize_text(text: str, replace_nums: bool = True,
                  input_type_processor=None) -> list[list[Word]]:
    """TryTokenizeBySents (PosTaggerExtensions.cs:61-72): Simple sentence
    split + Simple tokenize per sentence, empty sentences dropped.
    ``input_type_processor`` swaps the graphemic classifier (the
    IPosTaggerInputTypeProcessor slot); None = the default _En port."""
    u = xlat.to_u16(text)
    urls = allocate_urls(text, u)
    sents = split_sents_simple(text, u, urls)
    tk = _SentTokenizer(u, replace_nums, input_type_processor=input_type_processor)
    out = []
    for sent in sents:
        words = tk.tokenize(sent)
        if words:
            out.append(words)
    return out


def tokenize_text_console(text: str, replace_nums: bool = True) -> list[Word]:
    """Run_NoSentsAllocate (Tokenizer.cs:368-383): the console batch path —
    the whole line is ONE sentence (no sentence splitting), URLs detected,
    plain dot variant (dot kept in the word, uppercase-next flushes; this
    is how 'U.N.' / '2010г.' stay single tokens on the console path)."""
    u = xlat.to_u16(text)
    urls = allocate_urls(text, u)
    sent = Sent(0, len(u), tuple(urls))
    tk = _SentTokenizer(u, replace_nums, dot_variant="console")
    return tk.tokenize(sent)


def get_original_value(w: Word, text: str) -> str:
    # Tokenizer.GetOriginalValue (Tokenizer.cs:1347-1354)
    if w.input_type == IT_NUM:
        return text[w.start : w.start + w.length]
    return w.value
