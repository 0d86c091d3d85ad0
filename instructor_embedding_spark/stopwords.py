"""English stopword list used by the code-aware tokenizer.

This is the standard NLTK English stopword set, which the reference ships
verbatim as its lexical-matching stopword filter
(/root/reference/evaluation/prompt_retrieval/bridge_content_encoder.py:8-22,
``_stopwords``).  We reuse the same list so that lexical filtering semantics
match the reference's own matching layer (SURVEY.md P8/T3).
"""

from __future__ import annotations

STOPWORDS: frozenset[str] = frozenset(
    {
        "who", "ourselves", "down", "only", "were", "him", "at", "weren't",
        "has", "few", "it's", "m", "again", "d", "haven", "been", "other",
        "we", "an", "own", "doing", "ma", "hers", "all", "haven't", "in",
        "but", "shouldn't", "does", "out", "aren", "you", "you'd", "himself",
        "isn't", "most", "y", "below", "is", "wasn't", "hasn", "them",
        "wouldn", "against", "this", "about", "there", "don", "that'll",
        "a", "being", "with", "your", "theirs", "its", "any", "why", "now",
        "during", "weren", "if", "should", "those", "be", "they", "o", "t",
        "of", "or", "me", "i", "some", "her", "do", "will", "yours", "for",
        "mightn", "nor", "needn", "the", "until", "couldn't", "he", "which",
        "yourself", "to", "needn't", "you're", "because", "their", "where",
        "it", "didn't", "ve", "whom", "should've", "can", "shan't", "on",
        "had", "have", "myself", "am", "don't", "under", "was", "won't",
        "these", "so", "as", "after", "above", "each", "ours", "hadn",
        "having", "wasn", "s", "doesn", "hadn't", "than", "by", "that",
        "both", "herself", "his", "wouldn't", "into", "doesn't", "before",
        "my", "won", "more", "are", "through", "same", "how", "what", "over",
        "ll", "yourselves", "up", "mustn", "mustn't", "she's", "re", "such",
        "didn", "you'll", "shan", "when", "you've", "themselves", "mightn't",
        "she", "from", "isn", "ain", "between", "once", "here", "shouldn",
        "our", "and", "not", "too", "very", "further", "while", "off",
        "couldn", "hasn't", "itself", "then", "did", "just", "aren't",
    }
)

#: Stopwords that survive tokenization (the tokenizer splits on
#: non-alphanumerics, so apostrophe forms like "isn't" can never appear as
#: tokens; single-char entries are removed by the min-length rule).  This is
#: the effective filter set — and the one embedded into oracle SQL.
EFFECTIVE_STOPWORDS: tuple[str, ...] = tuple(
    sorted(w for w in STOPWORDS if len(w) > 1 and w.isalnum())
)


def stopword_sql_list() -> str:
    """The effective stopword set as a SQL IN-list literal."""
    return ", ".join(f"'{w}'" for w in EFFECTIVE_STOPWORDS)
