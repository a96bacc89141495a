"""Deterministic language identification heuristic.

Two signals, checked in order (first-match-wins, the reference's cascade
idiom, ocr.py:182-185):

1. Unicode-script ranges — CJK → zh, Arabic → ar, Cyrillic → ru, Devanagari
   → hi (script is near-conclusive and cheap).
2. Stopword-profile scoring over a small pinned function-word list for Latin
   languages (en/de/es/fr/it/pt) — ties broken by the pinned language order.

Pure function; no model files, no randomness. Used only when the input
``lang`` column is null (passthrough wins — matches the input contract where
``lang`` is a provided column).
"""

from __future__ import annotations

_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the of and to in is that it for was on are with as be at by this have from or had not but what all were when we there".split()),
    "de": frozenset("der die das und ist nicht ein eine zu den von mit sich des auf für im dem ich es auch als an werden aus er hat dass sie nach".split()),
    "es": frozenset("el la de que y en los se del las por un para con una su al es lo como más pero sus le ya o fue este sí porque".split()),
    "fr": frozenset("le la de et les des en un du une que est pour qui dans par plus pas au sur ne se ce il sont avec ils été cette".split()),
    "it": frozenset("il di che la e in un una per con non sono del della gli le si dei nel alla più anche come dal questo".split()),
    "pt": frozenset("o de a e que do da em um para é com não uma os no se na por mais as dos como mas foi ao ele das".split()),
}
_LANG_ORDER = ("en", "de", "es", "fr", "it", "pt")

# word → languages whose stopword list contains it (single-pass scoring)
_WORD_LANGS: dict[str, tuple[str, ...]] = {}
for _lang in _LANG_ORDER:
    for _w in _STOPWORDS[_lang]:
        _WORD_LANGS[_w] = _WORD_LANGS.get(_w, ()) + (_lang,)

# Script-range counters as compiled character classes: the codepoint ranges
# are pairwise disjoint, so len(findall) equals the per-char elif-chain count
# exactly; regex scan is C-speed vs ~0.6 ms/call for the Python loop.
import re as _re

_SCRIPT_RES: tuple[tuple[str, "_re.Pattern[str]"], ...] = (
    ("zh", _re.compile("[一-鿿]")),
    ("ja", _re.compile("[぀-ヿ]")),
    ("ko", _re.compile("[가-힯]")),
    ("ar", _re.compile("[؀-ۿ]")),
    ("ru", _re.compile("[Ѐ-ӿ]")),
    ("hi", _re.compile("[ऀ-ॿ]")),
)


def _script_lang(text: str) -> str | None:
    head = text[:2000]
    if head.isascii():  # C-speed fast path: ASCII ⇒ every script count is 0
        return None
    counts = {lang: len(p.findall(head)) for lang, p in _SCRIPT_RES}
    best = max(counts, key=lambda k: (counts[k], k))
    if counts[best] < 10:
        # threshold is max(10, 0.3*n_alpha) ≥ 10 — can't pass; and the
        # n_alpha == 0 branch below also returns None, so skip the alpha scan
        return None
    n_alpha = sum(map(str.isalpha, head))
    if n_alpha == 0:
        return None
    if counts[best] >= max(10, 0.3 * n_alpha):
        # ja subsumes zh kanji: prefer ja only if kana present
        if best == "zh" and counts["ja"] > 0:
            return "ja"
        return best
    return None


def detect_lang(text: str) -> str:
    """Return an ISO 639-1 code; 'und' when no signal."""
    if not text:
        return "und"
    s = _script_lang(text)
    if s:
        return s
    words = text[:4000].lower().split()
    if not words:
        return "und"
    # single pass over words (vs one membership sweep per language) — the
    # per-language scores are identical, argmax order unchanged
    scores = dict.fromkeys(_LANG_ORDER, 0)
    get = _WORD_LANGS.get
    for w in words:
        langs = get(w)
        if langs is not None:
            for lg in langs:
                scores[lg] += 1
    best_lang, best_score = "und", 0
    for lang in _LANG_ORDER:
        score = scores[lang]
        if score > best_score:
            best_lang, best_score = lang, score
    if best_score >= max(2, len(words) // 50):
        return best_lang
    return "und"
