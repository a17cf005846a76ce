"""Deterministic fallback analyzer semantics (SURVEY.md §2.5 M19-M21,
reference ``deepseek_analyzer.py:104-199,233-235``)."""

from cex_crawler_ray.functions.analyzer import (
    fallback_analysis,
    fix_json_response,
    flatten_result,
    validate_and_clean,
)


def test_listing_basic():
    r = fallback_analysis("公告：上架 BTC/USDT 交易对 2024-03-15 开放")
    assert r["listings"] == [
        {"symbol": "BTC/USDT", "action": "上架", "type": "现货", "time": "2024-03-15"}
    ]
    assert r["delistings"] == []


def test_delisting_keyword_contains_listing():
    # 'delisting' contains 'listing' -> BOTH sides emit (reference quirk)
    r = fallback_analysis("Notice of delisting ETH-USDT")
    assert r["listings"] == [
        {"symbol": "ETH-USDT", "action": "上架", "type": "现货", "time": "时间未明确"}
    ]
    assert r["delistings"] == [
        {"symbol": "ETH-USDT", "action": "下架", "type": "现货", "time": "时间未明确"}
    ]


def test_max_three_symbols():
    text = "listing AA/BB CC/DD EE/FF GG/HH"
    r = fallback_analysis(text)
    assert [e["symbol"] for e in r["listings"]] == ["AA/BB", "CC/DD", "EE/FF"]


def test_futures_type_and_cn_date():
    r = fallback_analysis("永续合约 上线 SOL/USDT 于 2024年3月5日")
    assert r["listings"][0]["type"] == "合约"
    assert r["listings"][0]["time"] == "2024年3月5日"


def test_symbol_regex_uppercases_input():
    # lowercase pairs match because the reference uppercases first
    r = fallback_analysis("listing btc/usdt now")
    assert r["listings"][0]["symbol"] == "BTC/USDT"


def test_no_keyword_no_records():
    r = fallback_analysis("BTC/USDT price update only")
    assert r == {"listings": [], "delistings": []}


def test_keyword_but_no_symbols():
    r = fallback_analysis("新增交易品种公告")
    assert r == {"listings": [], "delistings": []}


def test_validate_defaults():
    r = validate_and_clean({"listings": [{"symbol": "A/B"}]})
    assert r["listings"][0] == {
        "symbol": "A/B",
        "action": "上架",
        "type": "现货",
        "time": "时间未明确",
    }
    assert r["delistings"] == []
    r2 = validate_and_clean({"delistings": [{"symbol": "C/D", "time": "t"}]})
    assert r2["delistings"][0]["action"] == "下架"


def test_flatten_merge():
    result = {
        "listings": [{"symbol": "A/B", "action": "上架"}],
        "delistings": [{"symbol": "C/D", "action": "下架"}],
    }
    rows = flatten_result(result, {"exchange": "ex1", "url": "u"})
    assert len(rows) == 2
    assert rows[0]["exchange"] == "ex1" and rows[1]["url"] == "u"
    # listings come before delistings (reference concat order)
    assert rows[0]["symbol"] == "A/B"


def test_fix_json_response():
    assert fix_json_response('noise {"listings": []} trailing') == {
        "listings": []
    }
    assert fix_json_response("no json at all") == {
        "listings": [],
        "delistings": [],
    }


def test_llm_prompt_contract_roundtrip():
    """A production client that answers llm_prompt_for with strict
    JSON in the analyzer schema flows through fix_json_response +
    validate_and_clean exactly like the fallback output."""
    import json

    from cex_crawler_ray.functions.analyzer import (
        fix_json_response,
        validate_and_clean,
    )
    from cex_crawler_ray.stages.analyze import (
        LLM_REQUEST_PARAMS,
        llm_prompt_for,
    )

    assert LLM_REQUEST_PARAMS == {"temperature": 0.1, "max_tokens": 1000}
    prompt = llm_prompt_for("Binance will list FOO/USDT. " * 500)
    assert "listings" in prompt and "delistings" in prompt
    assert len(prompt) < 4200  # announcement text is truncated

    reply = (
        "模型输出：" +
        json.dumps(
            {
                "listings": [
                    {"symbol": "FOO/USDT", "action": "上架",
                     "type": "现货", "time": "2024-03-01"}
                ]
            },
            ensure_ascii=False,
        )
    )
    parsed = validate_and_clean(fix_json_response(reply))
    assert parsed["listings"][0]["symbol"] == "FOO/USDT"
    assert parsed["delistings"] == []
