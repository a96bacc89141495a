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


def _script_lang(text: str) -> str | None:
    head = text[:2000]
    if head.isascii():  # C-speed fast path: ASCII ⇒ every script count is 0
        return None
    counts = {"zh": 0, "ar": 0, "ru": 0, "hi": 0, "ja": 0, "ko": 0}
    n_alpha = 0
    for ch in head:
        cp = ord(ch)
        if 0x4E00 <= cp <= 0x9FFF:
            counts["zh"] += 1
        elif 0x3040 <= cp <= 0x30FF:
            counts["ja"] += 1
        elif 0xAC00 <= cp <= 0xD7AF:
            counts["ko"] += 1
        elif 0x0600 <= cp <= 0x06FF:
            counts["ar"] += 1
        elif 0x0400 <= cp <= 0x04FF:
            counts["ru"] += 1
        elif 0x0900 <= cp <= 0x097F:
            counts["hi"] += 1
        if ch.isalpha():
            n_alpha += 1
    if n_alpha == 0:
        return None
    best = max(counts, key=lambda k: (counts[k], k))
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
    best_lang, best_score = "und", 0
    for lang in _LANG_ORDER:
        sw = _STOPWORDS[lang]
        score = sum(1 for w in words if w in sw)
        if score > best_score:
            best_lang, best_score = lang, score
    if best_score >= max(2, len(words) // 50):
        return best_lang
    return "und"
