"""Probing n-gram language detection (SURVEY.md §2.9 X12).

Re-expresses the reference's probing control flow
(``lang-id/lang-id-tika-opennlp/.../ProbingLanguageDetector.java:50-200``)
from scratch over a self-contained char-n-gram model:

- char 1–3-grams accumulated across 300-codepoint chunks, max 10,000
  codepoints (DEFAULT_CHUNK_SIZE / DEFAULT_MAX_LENGTH);
- a prediction is probed every 110 n-grams (``++nGrams % 110``);
- early stop when the best language is unchanged with non-decreasing
  confidence over 2 consecutive probes (DEFAULT_MIN_CONSEC_IMPROVEMENTS)
  AND best-minus-second confidence ≥ 0.20 (DEFAULT_MIN_DIFF);
- result: languages ranked by confidence, like ``predictLanguages``.

The model itself is a multinomial n-gram scorer with add-one smoothing over
built-in seed corpora (authored here, no external data): P(lang | grams) ∝
Π P(gram | lang), confidences = softmax of length-normalized log-scores.
This stands in for the OpenNLP maxent model the reference loads from disk;
the probing semantics — the part the reference actually contributes — are
faithfully reproduced and unit-tested.

Spark surface: ``detect_languages_df`` — a vectorized mapInPandas over the
text column returning ``array<struct<lang,conf>>`` (the reference's
``LangDetector.detect → List<LangDetectResult>`` shape,
``lang-id/.../LangDetector.java``).
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

CHUNK_SIZE = 300
MAX_LENGTH = 10_000
MIN_CONSEC_IMPROVEMENTS = 2
MIN_DIFF = 0.20
PROBE_EVERY = 110

# ---------------------------------------------------------------------------
# seed corpora — short authored paragraphs per language (self-contained;
# the held-out test sentences live in tests/test_langid.py)
# ---------------------------------------------------------------------------
LANG_SAMPLES: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog while the children "
        "watch from the garden and their mother brings fresh bread with "
        "butter and honey because the morning light makes everything feel "
        "possible and the old clock on the wall keeps counting the hours "
        "that we spend together reading stories about distant mountains "
        "and the people who walk through them looking for a quiet place "
        "it was not always easy to know which way the road would turn but "
        "they had learned that patience and a good map were worth more "
        "than speed and that every town along the coast had its own songs "
        "which the fishermen sang when the boats came back in the evening "
        "this is why the village never felt empty even during the winter"
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund während die "
        "kinder aus dem garten zuschauen und ihre mutter frisches brot mit "
        "butter und honig bringt weil das morgenlicht alles möglich "
        "erscheinen lässt und die alte uhr an der wand weiter die stunden "
        "zählt die wir zusammen verbringen und geschichten über ferne "
        "berge lesen und über die menschen die dort einen stillen ort suchen "
        "es war nicht immer leicht zu wissen wohin der weg führen würde "
        "aber sie hatten gelernt dass geduld und eine gute karte mehr wert "
        "sind als geschwindigkeit und dass jede stadt an der küste ihre "
        "eigenen lieder hatte welche die fischer sangen wenn die boote am "
        "abend zurückkamen deshalb fühlte sich das dorf niemals leer an "
        "auch nicht während des langen winters wenn der schnee alles bedeckte"
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux pendant "
        "que les enfants regardent depuis le jardin et que leur mère "
        "apporte du pain frais avec du beurre et du miel parce que la "
        "lumière du matin rend tout possible et la vieille horloge sur le "
        "mur continue de compter les heures que nous passons ensemble à "
        "lire des histoires sur des montagnes lointaines et les gens qui y "
        "cherchent un endroit tranquille il n était pas toujours facile de "
        "savoir où la route allait tourner mais ils avaient appris que la "
        "patience et une bonne carte valaient mieux que la vitesse et que "
        "chaque ville au bord de la mer avait ses propres chansons que les "
        "pêcheurs chantaient quand les bateaux revenaient le soir c est "
        "pourquoi le village ne semblait jamais vide même pendant l hiver"
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso mientras los "
        "niños miran desde el jardín y su madre trae pan fresco con "
        "mantequilla y miel porque la luz de la mañana hace que todo "
        "parezca posible y el viejo reloj de la pared sigue contando las "
        "horas que pasamos juntos leyendo historias sobre montañas lejanas "
        "y la gente que busca allí un lugar tranquilo no siempre era fácil "
        "saber hacia dónde giraría el camino pero habían aprendido que la "
        "paciencia y un buen mapa valían más que la velocidad y que cada "
        "ciudad junto al mar tenía sus propias canciones que los pescadores "
        "cantaban cuando los barcos volvían por la tarde por eso el pueblo "
        "nunca parecía vacío ni siquiera durante los meses del invierno "
        "cuando la nieve cubría las calles y los niños jugaban dentro"
    ),
    "it": (
        "la veloce volpe marrone salta sopra il cane pigro mentre i bambini "
        "guardano dal giardino e la loro madre porta pane fresco con burro "
        "e miele perché la luce del mattino fa sembrare tutto possibile e "
        "il vecchio orologio sul muro continua a contare le ore che "
        "passiamo insieme leggendo storie di montagne lontane e della "
        "gente che vi cerca un posto tranquillo non era sempre facile "
        "sapere dove avrebbe girato la strada ma avevano imparato che la "
        "pazienza e una buona mappa valevano più della velocità e che ogni "
        "città sul mare aveva le sue canzoni che i pescatori cantavano "
        "quando le barche tornavano la sera per questo il paese non "
        "sembrava mai vuoto nemmeno durante i mesi dell inverno quando la "
        "neve copriva le strade e i bambini giocavano dentro casa"
    ),
    "pt": (
        "a rápida raposa marrom pula sobre o cão preguiçoso enquanto as "
        "crianças observam do jardim e a mãe delas traz pão fresco com "
        "manteiga e mel porque a luz da manhã faz tudo parecer possível e "
        "o velho relógio na parede continua contando as horas que passamos "
        "juntos lendo histórias sobre montanhas distantes e as pessoas que "
        "procuram ali um lugar tranquilo não era sempre fácil saber para "
        "onde a estrada iria virar mas eles tinham aprendido que a "
        "paciência e um bom mapa valiam mais do que a velocidade e que "
        "cada cidade à beira do mar tinha as suas próprias canções que os "
        "pescadores cantavam quando os barcos voltavam à tarde por isso a "
        "aldeia nunca parecia vazia nem mesmo durante os meses do inverno "
        "quando a neve cobria as ruas e as crianças brincavam dentro de casa"
    ),
    "nl": (
        "de snelle bruine vos springt over de luie hond terwijl de kinderen "
        "vanuit de tuin toekijken en hun moeder vers brood met boter en "
        "honing brengt omdat het ochtendlicht alles mogelijk laat lijken "
        "en de oude klok aan de muur de uren blijft tellen die we samen "
        "doorbrengen met het lezen van verhalen over verre bergen en de "
        "mensen die daar een stille plek zoeken het was niet altijd "
        "gemakkelijk om te weten welke kant de weg op zou gaan maar zij "
        "hadden geleerd dat geduld en een goede kaart meer waard waren dan "
        "snelheid en dat elke stad aan de kust haar eigen liederen had die "
        "de vissers zongen wanneer de boten in de avond terugkwamen daarom "
        "voelde het dorp nooit leeg zelfs niet tijdens de lange winter "
        "wanneer de sneeuw de straten bedekte en de kinderen binnen speelden"
    ),
    "sv": (
        "den snabba bruna räven hoppar över den lata hunden medan barnen "
        "tittar från trädgården och deras mor kommer med färskt bröd med "
        "smör och honung eftersom morgonljuset får allt att kännas möjligt "
        "och den gamla klockan på väggen fortsätter räkna timmarna som vi "
        "tillbringar tillsammans med att läsa berättelser om avlägsna "
        "berg och människorna som söker en stilla plats där det var inte "
        "alltid lätt att veta åt vilket håll vägen skulle svänga men de "
        "hade lärt sig att tålamod och en bra karta var mer värda än "
        "snabbhet och att varje stad vid kusten hade sina egna sånger som "
        "fiskarna sjöng när båtarna kom tillbaka på kvällen därför kändes "
        "byn aldrig tom inte ens under den långa vintern när snön täckte "
        "gatorna och barnen lekte inomhus vid elden"
    ),
}

_NORM_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


def _normalize(text: str) -> str:
    """Lowercase, letters only, single spaces — the role of the reference's
    CharSequenceNormalizer chain."""
    return " ".join(_NORM_RE.findall(text.lower()))


def _ngrams(text: str, n_min: int = 1, n_max: int = 3):
    """Char 1..3-grams over the normalized text; pure-space grams skipped
    (ProbingLanguageDetector skips SPACE)."""
    ln = len(text)
    for i in range(ln):
        for n in range(n_min, n_max + 1):
            if i + n > ln:
                break
            g = text[i : i + n]
            if g.isspace():
                continue
            yield g


def build_profiles(
    samples: dict[str, str] | None = None,
) -> dict[str, dict]:
    """Per-language add-one-smoothed log-prob tables over char 1–3 grams."""
    samples = samples or LANG_SAMPLES
    profiles = {}
    vocab: set[str] = set()
    counts_by_lang = {}
    for lang, text in samples.items():
        c = Counter(_ngrams(_normalize(text)))
        counts_by_lang[lang] = c
        vocab.update(c)
    v = len(vocab) + 1
    for lang, c in counts_by_lang.items():
        total = sum(c.values())
        profiles[lang] = {
            "logp": {g: math.log((k + 1) / (total + v)) for g, k in c.items()},
            "default": math.log(1.0 / (total + v)),
        }
    return profiles


_PROFILES = build_profiles()


# softmax evidence window: the per-gram average log-likelihood is scaled by
# min(total_grams, EVIDENCE_CAP) before the softmax. Uncapped totals make
# confidences one-hot regardless of margin; fully-normalized scores are so
# flat the 0.20 early-stop gap can never be reached. 64 grams of effective
# evidence gives maxent-like peaky confidences on unambiguous text while
# keeping short/ambiguous inputs soft.
EVIDENCE_CAP = 64


def _predict(gram_counts: Counter, profiles: dict) -> list[tuple[str, float]]:
    """Rank languages by softmax of evidence-scaled average log-likelihood
    (the analogue of ``predict()``'s maxent eval + sort)."""
    total = sum(gram_counts.values()) or 1
    scale = min(total, EVIDENCE_CAP)
    scores = {}
    for lang, prof in profiles.items():
        logp, default = prof["logp"], prof["default"]
        s = 0.0
        for g, k in gram_counts.items():
            s += k * logp.get(g, default)
        scores[lang] = s / total * scale
    m = max(scores.values())
    exps = {lang: math.exp(s - m) for lang, s in scores.items()}
    z = sum(exps.values())
    ranked = sorted(
        ((lang, e / z) for lang, e in exps.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )
    return ranked


def _seen_enough(history: list, min_consec: int, min_diff: float) -> bool:
    """Early-stop rule: same best language with non-decreasing confidence
    over the last ``min_consec`` probes, and best-second gap ≥ min_diff."""
    if len(history) < min_consec + 1:
        return False
    recent = history[-(min_consec + 1):]
    best_langs = {p[0][0] for p in recent}
    if len(best_langs) != 1:
        return False
    confs = [p[0][1] for p in recent]
    if any(b < a for a, b in zip(confs, confs[1:])):
        return False
    last = recent[-1]
    gap = last[0][1] - (last[1][1] if len(last) > 1 else 0.0)
    return gap >= min_diff


def detect_languages(
    text: str | None,
    profiles: dict | None = None,
    chunk_size: int = CHUNK_SIZE,
    max_length: int = MAX_LENGTH,
    min_consec: int = MIN_CONSEC_IMPROVEMENTS,
    min_diff: float = MIN_DIFF,
    probe_every: int = PROBE_EVERY,
) -> list[tuple[str, float]]:
    """The probing loop (predictLanguages): chunk → accumulate grams →
    probe every ``probe_every`` grams → early stop or run to max_length."""
    profiles = profiles or _PROFILES
    if not isinstance(text, str) or not text:
        return [("und", 0.0)]
    norm = _normalize(text[:max_length])
    if not norm:
        return [("und", 0.0)]

    gram_counts: Counter = Counter()
    history: list = []
    n_grams = 0
    current = None
    start = 0
    while start < len(norm):
        chunk = norm[start : start + chunk_size]
        start += chunk_size
        for g in _ngrams(chunk):
            gram_counts[g] += 1
            n_grams += 1
            if n_grams % probe_every == 0:
                current = _predict(gram_counts, profiles)
                history.append(current)
                if _seen_enough(history, min_consec, min_diff):
                    return current
    return current if current is not None else _predict(gram_counts, profiles)


RESULT_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("lang", T.StringType(), False),
            T.StructField("conf", T.DoubleType(), False),
        ]
    )
)


def detect_languages_df(
    df: DataFrame, id_col: str, text_col: str, top_k: int = 3
) -> DataFrame:
    """Vectorized Spark surface: (id, langs array<struct<lang,conf>>).

    mapInPandas so the (small) profile tables are built once per worker,
    not per row; scoring is dict lookups over the batch — the 100 TB cost
    model is identical to the extraction kernel's."""

    def batch(it):
        profs = _PROFILES
        for pdf in it:
            out = []
            for t in pdf[text_col]:
                ranked = detect_languages(t, profiles=profs)[:top_k]
                out.append(
                    [{"lang": lang, "conf": round(conf, 6)} for lang, conf in ranked]
                )
            yield pd.DataFrame({"id": pdf[id_col], "langs": out})

    schema = T.StructType(
        [
            T.StructField("id", df.schema[id_col].dataType, False),
            T.StructField("langs", RESULT_TYPE, False),
        ]
    )
    return df.select(id_col, text_col).mapInPandas(batch, schema=schema)
