#!/usr/bin/env python3
"""Ground-truth generator for the card channel render (q_j6_card_render).

Renders the REFERENCE Jinja templates (reference api/cards/render_pipeline
.py:74-132 + templates/cards/*.tg.j2) against contexts derived from the
same integer rules the Spark gate uses, and dumps the rendered strings to
src/test/resources/card_render_golden.jsonl. The ScalaTest CardRenderSpec
replays the SAME tuples through graft.operators.CardRender and compares
byte-for-byte — so the Scala format_string/when chains are pinned to the
reference templates' actual output, whitespace and all.

Run from /root/repo:  python3 tools/render_goldens.py
(dev tool — needs jinja2; the library itself never runs Python)
"""
import json
from jinja2 import Environment, FileSystemLoader

ENV = Environment(
    loader=FileSystemLoader("/root/reference/templates/cards"),
    autoescape=False)  # tg channel env (render_pipeline.py:44)
ENV_UI = Environment(
    loader=FileSystemLoader("/root/reference/templates/cards"),
    autoescape=True)  # ui channel env (render_pipeline.py:45 _env_ui)

CARD_TYPES = ["primary", "secondary", "topic", "market_risk"]
RISKS = ["red", "yellow", "gray", "green"]
CHAINS = ["eth", "bsc", "sol"]


def context(E, U, K, event_type="click", event_us=1700000000000000):
    """The gate's context derivation — integer/modulo rules only, so
    Spark, DuckDB and this script agree bit-for-bit."""
    ctx = {}
    card_type = CARD_TYPES[E % 4]
    risk_level = RISKS[U % 4]

    token_info = {}
    if U % 11 != 0:
        token_info["symbol"] = event_type.upper()
    if E % 3 != 1:
        token_info["chain"] = CHAINS[E % 3]
    if E % 5 != 2 or card_type == "secondary":
        token_info["ca_norm"] = "0x" + str(E).rjust(40, "0")
    if card_type in ("primary", "secondary") or U % 3 != 1:
        ctx["token_info"] = token_info

    # SOL green guardrail (render_pipeline.py:202-215): green on sol
    # becomes yellow + degrade BEFORE the template sees it
    guardrail = (token_info.get("chain") == "sol" and risk_level == "green"
                 and ("token_info" in ctx))
    if guardrail:
        risk_level = "yellow"
    ctx["risk_level"] = risk_level

    if card_type != "market_risk" or E % 5 != 4:
        ctx["risk_note"] = f"RN-{E}"

    metrics = {}
    if E % 7 != 3:
        metrics["price_usd"] = 0.0 if E % 13 == 0 else (E % 99991) / 100.0
    if U % 5 != 2:
        metrics["liquidity_usd"] = (U * 137 % 900000) + 0.25
    if E % 6 != 1:
        metrics["fdv"] = (U * 137 % 900000) * 4 + 0.25
    if E % 2 == 0:
        o = 0 if E % 34 == 0 else 64 + E % 17
        metrics["ohlc"] = {"h24": {"o": o, "c": 53 + E % 23}}
    ctx["metrics"] = metrics

    states = {}
    if E % 9 == 0 or guardrail:
        states["degrade"] = True
    ctx["states"] = states

    ctx["verify_path"] = f"/ev/{E}"
    ctx["data_as_of"] = "2024-01-15T10:30:00Z"
    if U % 7 == 0:
        ctx["legal_note"] = f"LEGAL-{U}"
    if E % 3 == 0:
        ctx["rules_fired"] = [f"R{E % 5}"]
    sources = {}
    if U % 2 == 0:
        sources["security_source"] = "goplus:batch"
    ctx["sources"] = sources

    if card_type == "primary" and E % 10 == 0:
        cands = []
        for i in (1, 2):
            c = {
                "chain": "eth" if i == 1 else "bsc",
                "ca": "0x" + str(E + i).rjust(40, "0"),
                "lp_usd": None if (E + i) % 3 == 0
                          else (U * 59 % 70000) + i + 0.25,
                "score": (E % 100 + i) / 16.0,
                "t_delta_min": None if (U + i) % 3 == 0 else (E + i) % 90,
                "evidence_strength": ["strong", "medium", "weak"][(E + i) % 3],
                "pair_url": f"https://dex.example/p/{E + i}",
            }
            cands.append(c)
        ctx["ambiguous_candidates"] = cands

    if card_type == "topic":
        if K % 3 == 0:
            ctx["topic_id"] = f"T{K}"
        n_e = E % 8
        if n_e > 0:
            ctx["topic_entities"] = [f"E{(K + j) % 50}" for j in range(n_e)]
        n_k = U % 7
        if n_k > 0:
            ctx["topic_keywords"] = [f"kw{(E + j) % 40}" for j in range(n_k)]
        if E % 5 != 1:
            ctx["topic_mention_count"] = E % 500
        if U % 4 != 1:
            ctx["topic_confidence"] = (U % 101) / 100.0
        else:
            ctx["topic_confidence"] = None
        n_s = (E + U) % 4
        if n_s > 0:
            ctx["topic_sources"] = [f"src{j}" for j in range(n_s)]
        n_l = E % 7
        if n_l > 0:
            ctx["topic_evidence_links"] = [
                f"https://x.example/s/{E + j}" for j in range(n_l)]

    if card_type == "market_risk":
        if E % 16 != 7:
            ctx["goplus_risk"] = RISKS[U % 4]
        if U % 6 != 1:
            ctx["buy_tax"] = (U % 300) / 10.0
        if U % 6 != 2:
            ctx["sell_tax"] = (U % 250) / 10.0
        if E % 7 != 6:
            ctx["lp_lock_days"] = (E % 40) - 5
        if E % 3 != 2:
            ctx["honeypot"] = U % 2 == 0
        if U % 5 == 3:
            ctx["risk_source"] = "cache"

    return card_type, ctx


def render(card_type, ctx):
    tpl = ENV.get_template(f"{card_type}_card.tg.j2")
    return tpl.render(card_data=ctx)


def ui_context(E, U, K):
    """UI-channel fixture = the shared context + ui-only wrinkles that
    plant HTML-escapable characters and the cache/dex footer keys the
    tg templates never read — so the autoescape semantics
    (render_pipeline.py:45) are actually exercised, without touching
    the tg goldens."""
    ct, ctx = context(E, U, K)
    ti = ctx.get("token_info", {})
    if U % 13 == 5 and "symbol" in ti:
        ti["symbol"] += " <A&B>\"q'"
    if E % 11 == 7 and "risk_note" in ctx:
        ctx["risk_note"] += " <b>&\"x\"'"
    if E % 12 == 5:
        ctx["verify_path"] += "?a=1&b=<2>"
    if U % 14 == 7 and "legal_note" in ctx:
        ctx["legal_note"] += " <i>&注</i>"
    if U % 4 == 2:
        ctx["sources"]["dex_source"] = "dex<screener>&v1"
    if U % 9 == 4:
        ctx["states"]["cache"] = True
    return ct, ctx


def render_ui(card_type, ctx):
    """render_template(payload, 'ui') incl. its degradation contract:
    any template exception (e.g. Undefined[:8] when ca_norm is absent
    on a primary card) falls back to _render_degraded's plain-text ui
    form (render_pipeline.py:124-132,135-154)."""
    try:
        tpl = ENV_UI.get_template(f"{card_type}_card.ui.j2")
        return tpl.render(card_data=ctx)
    except Exception:
        sym = ctx.get("token_info", {}).get("symbol", "UNKNOWN")
        risk = ctx.get("risk_level", "unknown")
        return f"{card_type} Card (Degraded)\nSymbol: {sym}\nRisk: {risk}"


# Tuples chosen to cover every template branch (type = E % 4):
# primary (E%4==0): ambiguous block (E%10==0), degrade (E%9==0), no-ca
# (E%5==2), all risk colors, 0-price, missing metrics, ohlc o==0 (E%34==0)
# secondary (1): risk colors, missing fdv (E%6==1)
# topic (2): id/entities/keywords/conf/sources/links present+absent
# market_risk (3): goplus fallback (E%8==5), tax/lp/honeypot presence mix
TUPLES = [
    # (E, U, K)
    (0, 0, 0), (20, 3, 7), (40, 7, 2), (60, 11, 9),    # primary + cands
    (8, 5, 1), (12, 22, 4), (52, 13, 5), (68, 2, 3),   # primary plain
    (36, 44, 6), (204, 15, 8),                          # primary degrade/o=0
    (1, 0, 0), (5, 1, 2), (13, 2, 3), (25, 3, 4),      # secondary
    (9, 7, 5), (21, 14, 6), (49, 33, 7),               # secondary more
    (2, 0, 0), (6, 1, 3), (14, 5, 6), (26, 9, 9),      # topic
    (34, 13, 12), (46, 21, 15), (66, 8, 18),           # topic more
    (3, 0, 0), (7, 1, 1), (15, 3, 2), (27, 9, 3),      # market_risk
    (35, 13, 4), (43, 25, 5), (63, 18, 6),             # mr more
    (23, 6, 1),   # mr goplus absent -> risk_level fallback (E%16==7)
    (19, 5, 2),   # mr without risk_note (E%5==4)
    (30, 3, 10),  # topic without topic_id (K%3!=0)
    (54, 2, 21),  # topic without sources ((E+U)%4==0), conf present
]

# Extra ui-channel tuples: escape wrinkles on every template
# (U%13==5), the degraded primary fallback (E%5==2, plain and with a
# wrinkled symbol), verify/legal/dex/cache wrinkles, the empty-but-
# present token_info dict (falsy in Jinja: 22,33), token-less topic
# and market_risk (U%3==1), the SOL-green guardrail on topic (14,3),
# and the wrinkled risk_note in a shown warning block (40,6 / 29,1).
UI_EXTRA = [
    (20, 5, 1), (13, 5, 0), (14, 5, 2), (27, 5, 3),  # symbol escapes
    (12, 5, 0),                                      # degraded + wrinkle
    (17, 7, 2), (17, 2, 1),                          # verify + legal/dex
    (1, 7, 0), (2, 7, 3),                            # legal wrinkle
    (5, 2, 0), (8, 4, 0), (16, 4, 2),                # dex + cache
    (22, 33, 1),                                     # empty token_info
    (27, 4, 0), (14, 4, 2),                          # token-less mr/topic
    (14, 3, 1),                                      # guardrail on topic
    (40, 6, 0), (29, 1, 0),                          # wrinkled risk_note
]

if __name__ == "__main__":
    out = []
    for (E, U, K) in TUPLES:
        ct, ctx = context(E, U, K)
        out.append({"e": E, "u": U, "k": K, "card_type": ct,
                    "rendered": render(ct, ctx)})
    path = "src/test/resources/card_render_golden.jsonl"
    with open(path, "w") as f:
        for r in out:
            f.write(json.dumps(r, ensure_ascii=False) + "\n")
    print(f"wrote {len(out)} goldens to {path}")

    out_ui = []
    for (E, U, K) in TUPLES + UI_EXTRA:
        ct, ctx = ui_context(E, U, K)
        out_ui.append({"e": E, "u": U, "k": K, "card_type": ct,
                       "rendered": render_ui(ct, ctx)})
    path_ui = "src/test/resources/card_render_ui_golden.jsonl"
    with open(path_ui, "w") as f:
        for r in out_ui:
            f.write(json.dumps(r, ensure_ascii=False) + "\n")
    print(f"wrote {len(out_ui)} ui goldens to {path_ui}")
    # eyeball one per type
    seen = set()
    for r in out:
        if r["card_type"] not in seen:
            seen.add(r["card_type"])
            print("=" * 30, r["card_type"], (r["e"], r["u"], r["k"]))
            print(repr(r["rendered"]))
