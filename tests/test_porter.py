"""Porter stemmer vectors — published examples from the algorithm
definition (Porter 1980 / tartarus.org def.txt), traced through ALL steps
(some def.txt examples show a single step's output; these are full-chain
expectations)."""

from luc4ir_spark.functions.porter import stem

VECTORS = {
    # step 1a/1b/1c
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall", "hissing": "hiss",
    "fizzed": "fizz", "failing": "fail", "filing": "file",
    "happy": "happi", "sky": "sky",
    # step 2-4 chains
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic", "vileli": "vile",
    "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formaliti": "formal",
    "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good", "revival": "reviv", "allowance": "allow",
    "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
    # the reference's destemmer probes (genutils/Destemmer.java:82):
    # babi <- babies, comput <- computers, veri <- very
    "babies": "babi", "very": "veri", "computers": "comput",
    # revised-implementation departures (bli->ble, logi->log)
    "archaeology": "archaeolog", "analogi": "analog",
    # short words pass through
    "a": "a", "is": "is", "by": "by",
}


def test_porter_vectors():
    bad = {w: (stem(w), e) for w, e in VECTORS.items() if stem(w) != e}
    assert not bad, f"stemmer mismatches: {bad}"


def test_idempotent_on_code_tokens():
    for tok in ["snake_case", "camelcase", "x", "int32", "def", "return"]:
        assert isinstance(stem(tok), str)
