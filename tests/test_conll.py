"""CoNLL reader/writer vs the reference parser's goldens
(tests/unit/test_conll_parser.py in the reference)."""

import pytest

from amharic_ecommerce_data_extractor_spark.sources.conll import (
    conll_token_rows,
    label_vocabulary,
    read_conll,
    train_eval_split,
    write_conll,
)

SAMPLE = """Dell\tB-PRODUCT
laptop\tI-PRODUCT
price\tO
1000\tB-PRICE
ETB\tI-PRICE

New   O
Phone  B-PRODUCT
+251911123456\tB-CONTACT_INFO


"""


@pytest.fixture()
def sample_path(tmp_path):
    p = tmp_path / "sample.conll"
    p.write_text(SAMPLE, encoding="utf-8")
    return str(p)


def test_read_conll_sentences(spark, sample_path):
    got = {r["sentence_id"]: (r["tokens"], r["labels"])
           for r in read_conll(spark, sample_path).collect()}
    assert len(got) == 2  # trailing blank lines do not create sentences
    assert got[0] == (["Dell", "laptop", "price", "1000", "ETB"],
                      ["B-PRODUCT", "I-PRODUCT", "O", "B-PRICE", "I-PRICE"])
    # whitespace-run delimiters accepted like the reference's re.split(r'\s+')
    assert got[1] == (["New", "Phone", "+251911123456"],
                      ["O", "B-PRODUCT", "B-CONTACT_INFO"])


def test_read_conll_malformed_raises(spark, tmp_path):
    p = tmp_path / "bad.conll"
    p.write_text("tok1\tO\ntok2 O extra\n", encoding="utf-8")
    with pytest.raises(Exception, match="Malformed CoNLL line"):
        read_conll(spark, str(p)).collect()


def test_read_conll_lenient(spark, tmp_path):
    p = tmp_path / "bad.conll"
    p.write_text("tok1\tO\ntok2 O extra\ntok3\tB-LOC\n", encoding="utf-8")
    rows = read_conll(spark, str(p), strict=False).collect()
    assert rows[0]["tokens"] == ["tok1", "tok3"]


def test_read_conll_missing_file(spark, tmp_path):
    with pytest.raises(Exception):
        read_conll(spark, str(tmp_path / "nope.conll")).collect()


def test_corrupted_label_passthrough(spark, tmp_path):
    # the reference corpus carries one corrupted label 'I-LOCገ'; parser
    # surfaces it verbatim (filtering happens at triple-emission)
    p = tmp_path / "c.conll"
    p.write_text("ቦሌ\tI-LOCገ\n", encoding="utf-8")
    rows = read_conll(spark, str(p)).collect()
    assert rows[0]["labels"] == ["I-LOCገ"]


def test_roundtrip_and_vocab(spark, sample_path, tmp_path):
    df = read_conll(spark, sample_path)
    out = str(tmp_path / "out_conll")
    write_conll(df, out)
    back = read_conll(spark, out + "/*.txt")
    a = [(r["tokens"], r["labels"]) for r in df.orderBy("sentence_id").collect()]
    b = [(r["tokens"], r["labels"]) for r in back.orderBy("sentence_id").collect()]
    assert a == b
    assert label_vocabulary(df) == ["B-CONTACT_INFO", "B-PRICE", "B-PRODUCT",
                                    "I-PRICE", "I-PRODUCT", "O"]
    tr, ev = train_eval_split(df)
    assert tr.count() + ev.count() == 2


def test_token_rows(spark, sample_path):
    rows = conll_token_rows(read_conll(spark, sample_path)).collect()
    assert len(rows) == 8
    first = [r for r in rows if r["sentence_id"] == 0 and r["pos"] == 0][0]
    assert (first["token"], first["label"]) == ("Dell", "B-PRODUCT")
