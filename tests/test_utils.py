"""Tests for the pure-Python utils layer (metrics, JSON protocol, tree edit)."""

import pytest

from pixparse_tpu.utils import (
    JSONParseEvaluator,
    TreeNode,
    average_normalized_levenshtein_similarity,
    cer_metric,
    clean_name,
    json2token,
    natural_key,
    token2json,
    tree_edit_distance,
    wer_metric,
)
from pixparse_tpu.utils.metrics import levenshtein_py


def test_levenshtein_py():
    assert levenshtein_py("kitten", "sitting") == 3
    assert levenshtein_py("", "abc") == 3
    assert levenshtein_py("abc", "abc") == 0
    assert levenshtein_py(["a", "b"], ["a", "c", "b"]) == 1


def test_anls():
    gt = [["store", "the store"], ["4200"]]
    preds = ["store", "4203"]
    # second: nl = 1/4 < tau → similarity 0.75
    score = average_normalized_levenshtein_similarity(gt, preds)
    assert score == pytest.approx((1.0 + 0.75) / 2)


def test_anls_below_tau_zero():
    assert average_normalized_levenshtein_similarity([["abcdef"]], ["zzzzzz"]) == 0.0


def test_wer_cer_identical():
    assert wer_metric(["hello world"], ["hello world"]) == 0.0
    assert cer_metric(["hello"], ["hello"]) == 0.0


def test_wer_one_sub():
    # remove_words="<pad>" deletes standalone 'p'/'a'/'d' words (documented
    # reference jiwer quirk) — avoid those letters in fixtures.
    assert wer_metric(["the cat sat"], ["the bat sat"]) == pytest.approx(1 / 3)


def test_cer_value():
    # "hello" -> "hxllo": 1 char sub over 5 ref chars
    assert cer_metric(["hello"], ["hxllo"]) == pytest.approx(1 / 5)


def test_wer_pad_quirk():
    # Standalone 'a' is removed from both sides, so these are equal.
    assert wer_metric(["this is a test"], ["this is test"]) == 0.0


def test_json2token_roundtrip_simple():
    obj = {"menu": {"name": "cake", "count": "2"}}
    text, toks = json2token(obj, [], sort_json_key=True)
    assert text == "<s_menu><s_name>cake</s_name><s_count>2</s_count></s_menu>"
    assert "<s_menu>" in toks and "</s_count>" in toks
    parsed = token2json(text)
    assert parsed == {"menu": {"name": "cake", "count": "2"}}


def test_json2token_list_sep():
    obj = {"items": [{"name": "a1"}, {"name": "b2"}]}
    text, _ = json2token(obj, [])
    assert text == "<s_items><s_name>a1</s_name><sep/><s_name>b2</s_name></s_items>"
    parsed = token2json(text)
    assert parsed == {"items": [{"name": "a1"}, {"name": "b2"}]}


def test_json2token_categorical_token():
    text, _ = json2token({"class": "advertisement"}, ["<advertisement/>"])
    assert text == "<s_class><advertisement/></s_class>"
    parsed = token2json(text, added_vocab={"<advertisement/>": 1})
    assert parsed == {"class": "advertisement"}


def test_json2token_text_sequence_passthrough():
    text, _ = json2token({"text_sequence": "raw ocr text"}, [])
    assert text == "raw ocr text"


def test_token2json_tagfree_fallback():
    assert token2json("no tags here") == {"text_sequence": "no tags here"}


def test_tree_edit_distance_basic():
    def one(_node):
        return 1

    def upd(a, b):
        return int(a.label != b.label)

    t1 = TreeNode("root", [TreeNode("a"), TreeNode("b")])
    t2 = TreeNode("root", [TreeNode("a"), TreeNode("c")])
    assert tree_edit_distance(t1, t2, one, one, upd) == 1
    t3 = TreeNode("root", [TreeNode("a")])
    assert tree_edit_distance(t1, t3, one, one, upd) == 1  # remove 'b'
    assert tree_edit_distance(t1, t1, one, one, upd) == 0


def test_tree_edit_distance_nested():
    def one(_node):
        return 1

    def upd(a, b):
        return int(a.label != b.label)

    t1 = TreeNode("r", [TreeNode("x", [TreeNode("y")])])
    t2 = TreeNode("r", [TreeNode("x")])
    assert tree_edit_distance(t1, t2, one, one, upd) == 1


def test_json_evaluator_acc_exact():
    ev = JSONParseEvaluator()
    gt = {"menu": [{"name": "cake", "cnt": "2"}, {"name": "juice", "cnt": "1"}]}
    assert ev.cal_acc(gt, gt) == pytest.approx(1.0)
    assert ev.cal_acc({}, gt) == pytest.approx(0.0)


def test_json_evaluator_acc_partial():
    ev = JSONParseEvaluator()
    gt = {"menu": [{"name": "cake"}, {"name": "juice"}]}
    pred = {"menu": [{"name": "cake"}]}
    acc = ev.cal_acc(pred, gt)
    assert 0.0 < acc < 1.0


def test_json_evaluator_f1():
    ev = JSONParseEvaluator()
    gt = [{"a": "1", "b": "2"}]
    pred_perfect = [{"a": "1", "b": "2"}]
    assert ev.cal_f1(pred_perfect, gt) == pytest.approx(1.0)
    pred_half = [{"a": "1", "b": "3"}]
    # tp=1, fp=1 (b=3), fn=1 (b=2) => 1 / (1 + 2/2) = 0.5
    assert ev.cal_f1(pred_half, gt) == pytest.approx(0.5)


def test_json_evaluator_flatten_and_normalize():
    ev = JSONParseEvaluator()
    data = {"menu": [{"name": ["cake"], "count": ["2"]}]}
    flat = ev.flatten(data)
    assert ("menu.name", "cake") in flat and ("menu.count", "2") in flat
    norm = ev.normalize_dict({"b": "x", "aa": "", "c": ["y", ""]})
    assert norm == {"b": ["x"], "c": ["y"]}


def test_name_utils():
    assert clean_name("facebook/bart-base") == "facebook_bart_base"
    assert natural_key("cfg10") > natural_key("cfg2")


def test_token2json_regex_metachar_key_does_not_crash():
    from pixparse_tpu.utils import token2json

    out = token2json("<s_(>garbage</s_(>")  # malformed generated tag
    assert isinstance(out, dict)


def test_cal_acc_empty_ground_truth():
    from pixparse_tpu.utils import JSONParseEvaluator

    ev = JSONParseEvaluator()
    assert ev.cal_acc({}, {}) == 1.0
    assert ev.cal_acc({"a": "b"}, {}) == 0.0


def test_anls_empty_strings():
    from pixparse_tpu.utils import average_normalized_levenshtein_similarity

    out = average_normalized_levenshtein_similarity(
        ground_truth=[[""]], predicted_answers=[""]
    )
    assert out == 1.0
