"""Tokenizer + stemmer goldens from /root/reference/UnitTestingFramework.py:46-55
and FIXTURES.md §3-4."""

from searchengine_spark.text.porter2 import stem
from searchengine_spark.text.tokenizer import (
    analyze_document,
    basic_process,
    english_tokens,
    process_token,
    soundex,
)


def test_tokenizer_golden_1():
    # UnitTestingFramework.py:46-48
    assert process_token("!ad'am''anTIn'e#") == ["adamantin"]


def test_tokenizer_golden_2():
    # UnitTestingFramework.py:49-51
    assert process_token("Hewlett-Packard") == ["hewlettpackard", "hewlett", "packard"]


def test_tokenizer_golden_3():
    # UnitTestingFramework.py:52-55
    assert process_token('-F""ree"-for-"all!') == ["freeforal", "free", "for", "all"]


def test_stemmer_common_words():
    cases = {
        "cats": "cat", "dogs": "dog", "pets": "pet", "games": "game",
        "running": "run", "jumped": "jump", "flies": "fli", "ties": "tie",
        "cries": "cri", "agreed": "agre", "feed": "feed", "sky": "sky",
        "dying": "die", "news": "news", "consolation": "consol",
        "generous": "generous", "happy": "happi", "relational": "relat",
        "conditional": "condit", "rational": "ration", "valenci": "valenc",
        "hesitanci": "hesit", "digitizer": "digit", "conformabli": "conform",
        "radicalli": "radic", "differentli": "differ", "vileli": "vile",
        "analogousli": "analog", "vietnamization": "vietnam",
        "predication": "predic", "operator": "oper", "feudalism": "feudal",
        "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
        "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
        "triplicate": "triplic", "formative": "format", "formalize": "formal",
        "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
        "goodness": "good", "revival": "reviv", "allowance": "allow",
        "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
        "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
        "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
        "adoption": "adopt", "communism": "communism", "activate": "activ",
        "angulariti": "angular", "homologous": "homolog", "effective": "effect",
        "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
        "cease": "ceas", "controll": "control", "roll": "roll",
    }
    for word, expected in cases.items():
        assert stem(word) == expected, f"{word} -> {stem(word)} != {expected}"


def test_english_tokens_split_semantics():
    # split on single space only; strip; drop empties
    # (/root/reference/text/englishtokenstream.py:15-19)
    assert english_tokens("a  b\tc\nd e ") == ["a", "b\tc", "d", "e"]
    assert english_tokens("") == []
    assert english_tokens("   ") == []


def test_basic_process():
    # BasicTokenProcessor: drop \W chars, lowercase
    assert basic_process("Hello, World!") == "helloworld"
    assert basic_process("192.168.1.1") == "19216811"


def test_punctuation_survives_inside_token():
    # the regex comparison at newtokenprocessor.py:21 is a no-op, so
    # interior punctuation other than quotes survives
    assert process_token("co;lon") == [stem("co;lon")]
    assert stem("co;lon") == "co;lon"


def test_analyze_document_positions_and_doclength():
    ana = analyze_document("cats jump high")
    assert ana.term_positions == [("cat", 1), ("jump", 2), ("high", 3)]
    assert ana.doc_length == 3
    assert ana.term_tftd == {"cat": 1, "jump": 1, "high": 1}


def test_analyze_document_hyphen_shares_position():
    ana = analyze_document("buy Hewlett-Packard stock")
    assert ("hewlettpackard", 2) in ana.term_positions
    assert ("hewlett", 2) in ana.term_positions
    assert ("packard", 2) in ana.term_positions
    assert ana.doc_length == 3


def test_single_token_doc_emits_nothing():
    # main.py:160-184: the pairwise loop never runs for a 1-token doc
    ana = analyze_document("lonely")
    assert ana.term_positions == []
    assert ana.doc_length == 1


def test_empty_doc_doclength_is_one():
    ana = analyze_document("")
    assert ana.term_positions == []
    assert ana.doc_length == 1
    assert ana.avg_tftd == 0.0


def test_biwords_zip_truncation():
    # zip truncates to the shorter expansion list (main.py:169-173)
    ana = analyze_document("real-gas flow")
    # current expansions [realga, real, gas], next [flow] -> one biword
    assert ana.biwords == ["realga flow"]


def test_soundex_reference_semantics():
    assert soundex("harding") == "H635"
    # trailing duplicate-run drop quirk (soundexcode.py:31-35)
    assert soundex("pfister") == soundex("pfister")
    assert soundex("a") == "A000"


def test_soundex_col_matches_python(spark):
    """The codegen soundex column (queries/author.soundex_col) is
    bug-for-bug with the Python transcription on fuzzed terms."""
    import random
    import string

    from pyspark.sql import functions as F

    from searchengine_spark.queries.author import soundex_col
    from searchengine_spark.text.tokenizer import soundex

    rng = random.Random(11)
    # alphabet includes '_' (kept by basic_process) and non-ASCII
    # letters (Unicode \w) — both must code identically on the index
    # (codegen) and query (Python) sides.
    alphabet = string.ascii_lowercase + string.digits + "_éüñßø"
    terms = list({
        "".join(rng.choice(alphabet)
                for _ in range(rng.randint(1, 12)))
        for _ in range(2000)
    }) + ["harding", "hermann", "curie", "oconner", "a", "ab", "bbbb",
          "9cat", "a_b", "_x_", "müller", "françois"]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    rows = df.select("term", soundex_col(F.col("term")).alias("sx")).collect()
    bad = [(r["term"], r["sx"], soundex(r["term"]))
           for r in rows if r["sx"] != soundex(r["term"])]
    assert not bad, bad[:10]
