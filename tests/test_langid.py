"""X12 probing language detection: held-out accuracy, probing/early-stop
semantics, and the Spark surface."""

from __future__ import annotations

import pytest

from tika_addons_spark.functions import langid

# held-out sentences — authored separately from the LANG_SAMPLES seed text
HELDOUT = {
    "en": [
        "yesterday we walked along the river and talked about the weather",
        "she opened the window because the room was warm and quiet",
        "nobody knew why the train was late again this evening",
        "the students finished their work before the sun went down",
    ],
    "de": [
        "gestern gingen wir am fluss entlang und sprachen über das wetter",
        "sie öffnete das fenster weil das zimmer warm und ruhig war",
        "niemand wusste warum der zug heute abend wieder verspätet war",
        "die schüler beendeten ihre arbeit bevor die sonne unterging",
    ],
    "fr": [
        "hier nous avons marché le long de la rivière en parlant du temps",
        "elle a ouvert la fenêtre parce que la pièce était chaude et calme",
        "personne ne savait pourquoi le train était encore en retard ce soir",
        "les étudiants ont terminé leur travail avant le coucher du soleil",
    ],
    "es": [
        "ayer caminamos junto al río y hablamos sobre el tiempo",
        "ella abrió la ventana porque la habitación estaba cálida y tranquila",
        "nadie sabía por qué el tren llegaba tarde otra vez esta noche",
        "los estudiantes terminaron su trabajo antes de que se pusiera el sol",
    ],
    "it": [
        "ieri abbiamo camminato lungo il fiume parlando del tempo",
        "lei ha aperto la finestra perché la stanza era calda e tranquilla",
        "nessuno sapeva perché il treno fosse di nuovo in ritardo stasera",
        "gli studenti hanno finito il loro lavoro prima del tramonto",
    ],
    "pt": [
        "ontem caminhamos ao longo do rio e conversamos sobre o tempo",
        "ela abriu a janela porque o quarto estava quente e tranquilo",
        "ninguém sabia por que o trem estava atrasado de novo esta noite",
        "os estudantes terminaram o trabalho antes do pôr do sol",
    ],
    "nl": [
        "gisteren liepen we langs de rivier en praatten over het weer",
        "zij opende het raam omdat de kamer warm en rustig was",
        "niemand wist waarom de trein vanavond weer te laat was",
        "de studenten maakten hun werk af voordat de zon onderging",
    ],
    "sv": [
        "igår promenerade vi längs floden och pratade om vädret",
        "hon öppnade fönstret eftersom rummet var varmt och stilla",
        "ingen visste varför tåget var försenat igen i kväll",
        "studenterna avslutade sitt arbete innan solen gick ner",
    ],
}


def test_heldout_accuracy_at_least_95pct():
    total, correct = 0, 0
    for lang, sentences in HELDOUT.items():
        for s in sentences:
            got = langid.detect_languages(s)
            total += 1
            if got[0][0] == lang:
                correct += 1
    assert correct / total >= 0.95, f"{correct}/{total}"


def test_result_shape_and_ranking():
    got = langid.detect_languages("the cat sat on the mat and looked at the door")
    assert got[0][0] == "en"
    confs = [c for _, c in got]
    assert confs == sorted(confs, reverse=True)
    assert abs(sum(confs) - 1.0) < 1e-9  # softmax normalized
    assert all(0.0 <= c <= 1.0 for c in confs)


def test_empty_and_nontext_return_und():
    assert langid.detect_languages(None) == [("und", 0.0)]
    assert langid.detect_languages("") == [("und", 0.0)]
    assert langid.detect_languages("12345 67890 !!!")[0][0] == "und"


def test_early_stop_probes_less_than_full_scan():
    """Probing semantics: on a long unambiguous text the detector must stop
    after a few probes, not scan all 10k codepoints. We detect that via a
    counting profile wrapper."""
    text = ("the old house stood near the river and the children played "
            "in the garden every single afternoon ") * 200  # ~18k chars
    calls = {"n": 0}
    profiles = langid._PROFILES

    class CountingDict(dict):
        def items(self):
            calls["n"] += 1
            return super().items()

    counting = CountingDict(profiles)
    res = langid.detect_languages(text, profiles=counting)
    assert res[0][0] == "en"
    # full scan of 10k codepoints ≈ 3*10k grams / 110 ≈ 255 probes; early
    # stop must cut that by an order of magnitude (tiny confidence jitter
    # can reset the non-decreasing window a few times, as in the reference's
    # raw-double comparison, so it lands in the teens rather than at 3)
    assert calls["n"] <= 30, calls["n"]


def test_respects_max_length():
    # text flips language after 10k codepoints — the tail must be ignored
    head = "el perro duerme en la casa junto a la chimenea caliente " * 200
    tail = "the dog sleeps in the house next to the warm fireplace " * 400
    text = head[:10_000] + tail
    assert langid.detect_languages(text)[0][0] == "es"


def test_spark_surface(spark):
    rows = [
        (1, "the children walked to school in the morning sunshine today"),
        (2, "die kinder gingen heute morgen im sonnenschein zur schule"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.id: r.langs for r in langid.detect_languages_df(df, "doc_id", "text").collect()}
    assert out[1][0].lang == "en" and out[1][0].conf > 0.3
    assert out[2][0].lang == "de"
    assert out[3][0].lang == "und"
    assert len(out[1]) <= 3
