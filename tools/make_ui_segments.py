#!/usr/bin/env python3
"""Derive the UI-channel render segment resources from the reference
templates (dev tool, run once per template change).

The reference renders cards into a second channel — HTML via the four
.ui.j2 templates under an autoescaping Jinja environment (reference
api/cards/render_pipeline.py:49-66 `_env_ui`, templates/cards/
*.ui.j2). graft renders the same strings with pure concat/when chains
(operators/CardRenderUi.scala); the STATIC text between interpolation
points is the data contract both the Spark chain and the DuckDB
oracle must carry verbatim, so it lives once, in
src/main/resources/ui/*.ui.seg, with `⟦token⟧` placeholders where the
dynamic pieces go.

This script produces those .seg files by exact-string replacement of
every Jinja construct in the template source. Each replacement embeds
the Jinja whitespace-control semantics (`{%-`/`-%}`/`{#- -#}` eat the
adjacent whitespace, untrimmed tags leave it) by consuming the eaten
whitespace as part of the matched source text. Replacement counts are
asserted, and the output must contain no Jinja syntax — a template
drift upstream fails loudly here, and byte-fidelity of the segment
semantics is pinned end-to-end by CardRenderUiSpec against goldens
rendered through the REAL templates (tools/render_goldens.py).

primary_card.ui.j2 and secondary_card.ui.j2 are byte-identical in the
reference; one segment file serves both card types.
"""
import os

REF = "/root/reference/templates/cards"
OUT = "src/main/resources/ui"

COLOR_CHAIN = ("{% if card_data.risk_level == 'red' %}#ff4444"
               "{% elif card_data.risk_level == 'yellow' %}#ffaa00"
               "{% elif card_data.risk_level == 'gray' %}#808080"
               "{% else %}#44ff44{% endif %}")
WARNBG_CHAIN = ("{% if card_data.risk_level == 'red' %}#fee"
                "{% elif card_data.risk_level == 'yellow' %}#fff3cd"
                "{% elif card_data.risk_level == 'gray' %}#f0f0f0"
                "{% else %}#d4edda{% endif %}")
BADGE_CHAIN = ("{% if card_data.risk_level == 'red' %}高风险\n            "
               "{% elif card_data.risk_level == 'yellow' %}中风险\n            "
               "{% elif card_data.risk_level == 'gray' %}服务降级\n            "
               "{% else %}低风险{% endif %}")

# the `\n        \n        ` runs are the whitespace the `{#-`/`{%-`
# left-trims eat — consumed as part of the matched source so the .seg
# file carries exactly what Jinja emits
RISK_WARN_BLOCK = ("\n        \n        "
                   "{#- Risk warning block - only show for non-green -#}"
                   "\n        "
                   "{%- if card_data.risk_level in ['red', 'yellow', 'gray'] %}"
                   '\n        <div class="risk-warning">'
                   "\n            <strong>⚠️ 风险提示:</strong> "
                   "{{ card_data.risk_note | e }}"
                   "\n        </div>\n        {%- endif %}")

DEGRADE_BLOCK = ("\n        \n        "
                 "{#- Degraded state warning -#}\n        "
                 "{%- if card_data.states.degrade %}"
                 '\n        <div class="degraded-warning">'
                 "\n            ⚠️ <strong>服务降级提示:</strong> "
                 "部分数据服务暂时不可用，显示结果基于缓存或降级策略"
                 "\n        </div>\n        {%- endif %}")

DEBUG_COMMENT = ("\n        \n        "
                 "{#- Hidden debug block for rules_fired and risk_source -#}"
                 "\n        ")

H24_BLOCK = """\n            {%- if card_data.metrics.ohlc and card_data.metrics.ohlc.h24 and card_data.metrics.ohlc.h24.c and card_data.metrics.ohlc.h24.o %}
            <div class="metric-item">
                <div class="metric-label">24h 变化</div>
                <div class="metric-value">{{ "%.2f" | format(((card_data.metrics.ohlc.h24.c - card_data.metrics.ohlc.h24.o) / card_data.metrics.ohlc.h24.o * 100) if card_data.metrics.ohlc.h24.o else 0) }}%</div>
            </div>
            {%- endif %}"""


def cell(var, fmt_expr):
    return ('<div class="metric-value">\n                    '
            f"{{%- if card_data.metrics.{var} -%}}\n                    "
            f"${{{{ {fmt_expr} }}}}\n                    "
            "{%- else -%}待获取{%- endif -%}\n                </div>")


PRIMARY = [
    (COLOR_CHAIN, "⟦color⟧", 3),
    (WARNBG_CHAIN, "⟦warnbg⟧", 1),
    (BADGE_CHAIN, "⟦badge⟧", 1),
    ("{{ card_data.token_info.symbol | e }}", "⟦symbol_e⟧", 1),
    ("{{ card_data.token_info.chain | upper | e }}", "⟦chain_up_e⟧", 1),
    ("{{ card_data.token_info.ca_norm[:8] | e }}", "⟦ca8⟧", 1),
    ("{{ card_data.token_info.ca_norm[-6:] | e }}", "⟦ca_6⟧", 1),
    (RISK_WARN_BLOCK, "⟦risk_warn⟧", 1),
    (cell("price_usd", '"%.6f" | format(card_data.metrics.price_usd)'),
     '<div class="metric-value">⟦price_cell⟧</div>', 1),
    (cell("liquidity_usd",
          '"{:,.0f}".format(card_data.metrics.liquidity_usd)'),
     '<div class="metric-value">⟦liq_cell⟧</div>', 1),
    (cell("fdv", '"{:,.0f}".format(card_data.metrics.fdv)'),
     '<div class="metric-value">⟦fdv_cell⟧</div>', 1),
    (H24_BLOCK, "⟦h24_block⟧", 1),
    (DEGRADE_BLOCK, "⟦degrade_block⟧", 1),
    (DEBUG_COMMENT, "", 1),
    ("{{ card_data.verify_path | e }}", "⟦verify_e⟧", 2),
    ("{{ card_data.data_as_of | e }}", "⟦asof_e⟧", 1),
    ("{{ card_data.legal_note or '本信息仅为风险线索与技术判断，不构成投资建议。' | e }}",
     "⟦legal_e⟧", 1),
    ("{{ card_data.sources.security_source | e }}", "⟦secsrc_e⟧", 1),
    ("{{ card_data.sources.dex_source | e }}\n                "
     "{%- if card_data.states.cache %} (缓存){%- endif %}",
     "⟦dexsrc_e⟧⟦cache_sfx⟧", 1),
    ("{{ card_data.rules_fired | tojson if card_data.rules_fired else '[]' }}",
     "⟦rules_json⟧", 1),
    ("{{ card_data.sources.security_source if card_data.sources.security_source else '' }}",
     "⟦secsrc_raw⟧", 1),
]

TOKEN_BLOCK = """{% if card_data.token_info %}
  <div class="token-info">
    <strong>候选代币:</strong> {{ card_data.token_info.symbol | default('UNKNOWN') }} ({{ card_data.token_info.chain | default('eth') | upper }})
    {% if card_data.token_info.ca_norm %}
    <br><strong>合约地址:</strong> <code>{{ card_data.token_info.ca_norm[:6] }}...{{ card_data.token_info.ca_norm[-4:] }}</code>
    {% endif %}
  </div>
  {% endif %}"""

DEGRADE_ALERT = """{% if card_data.states is defined and card_data.states.degrade %}
  <div class="alert alert-warning">
    ⚠️ <strong>服务降级提示:</strong> 部分数据服务暂时不可用，显示结果基于缓存或降级策略
  </div>
  {% endif %}"""

LINKS_ITEM = """{% if card_data.topic_evidence_links is defined and card_data.topic_evidence_links and card_data.topic_evidence_links|length > 0 %}
      <li><strong>证据:</strong>
        {% for link in card_data.topic_evidence_links[:5] %}
        <a href="{{ link }}">证据{{ loop.index }}</a>{% if not loop.last %}, {% endif %}
        {% endfor %}
      </li>
      {% endif %}"""


def li_item(cond, body):
    return f"{{% if {cond} %}}\n      {body}\n      {{% endif %}}"


TOPIC = [
    ("{#- Topic Card Template for UI (HTML) -#}\n", "", 1),
    (TOKEN_BLOCK, "⟦token_block⟧", 1),
    (li_item("card_data.topic_id is defined and card_data.topic_id",
             "<li><strong>话题ID:</strong> {{ card_data.topic_id }}</li>"),
     "⟦topic_id_item⟧", 1),
    (li_item("card_data.topic_entities is defined and card_data.topic_entities"
             " and card_data.topic_entities|length > 0",
             "<li><strong>相关实体:</strong> "
             "{{ card_data.topic_entities[:5] | join(', ') }}</li>"),
     "⟦entities_item⟧", 1),
    (li_item("card_data.topic_keywords is defined and card_data.topic_keywords"
             " and card_data.topic_keywords|length > 0",
             "<li><strong>关键词:</strong> "
             "{{ card_data.topic_keywords[:5] | join(', ') }}</li>"),
     "⟦keywords_item⟧", 1),
    ("{{ card_data.topic_mention_count | default('N/A') }}", "⟦mention⟧", 1),
    ('{{ "%.1f%%" | format(card_data.topic_confidence * 100) if '
     "card_data.topic_confidence is defined and card_data.topic_confidence "
     'is not none else "待计算" }}', "⟦confidence⟧", 1),
    (li_item("card_data.topic_sources is defined and card_data.topic_sources"
             " and card_data.topic_sources|length > 0",
             "<li><strong>来源:</strong> "
             "{{ card_data.topic_sources[:5] | join(', ') }}</li>"),
     "⟦sources_item⟧", 1),
    (LINKS_ITEM, "⟦links_item⟧", 1),
    (DEGRADE_ALERT, "⟦degrade_alert⟧", 1),
    ("{{ card_data.verify_path | default('/') }}", "⟦verify_def⟧", 1),
    ("{{ card_data.data_as_of | default('N/A') }}", "⟦asof_def⟧", 1),
    ('{{ card_data.legal_note | default("本信息仅为风险线索与技术判断，不构成投资建议。") }}',
     "⟦legal_def⟧", 1),
]

MR_BADGE = """{% if risk == 'red' %}
    <span class="badge badge-danger">🔴 高风险警报</span>
    {% elif risk == 'yellow' %}
    <span class="badge badge-warning">🟡 中风险提示</span>
    {% elif risk == 'gray' %}
    <span class="badge badge-secondary">⚫ 服务降级</span>
    {% else %}
    <span class="badge badge-success">🟢 低风险信号</span>
    {% endif %}"""

MR_RISK_NOTE = """{% if card_data.risk_note %}
  <div class="alert alert-warning">
    ⚠️ <strong>风险提示:</strong> {{ card_data.risk_note }}
  </div>
  {% endif %}"""

MARKET_RISK = [
    ("{#- Market Risk Card Template for UI (HTML) -#}\n"
     "{%- set risk = card_data.goplus_risk | default(card_data.risk_level) "
     "| default('gray') -%}\n", "", 1),
    (MR_BADGE, "⟦mr_badge⟧", 1),
    (TOKEN_BLOCK, "⟦token_block⟧", 1),
    (MR_RISK_NOTE, "⟦mr_risk_note⟧", 1),
    ("{% if risk == 'red' %}🔴 高风险{% elif risk == 'yellow' %}🟡 中风险"
     "{% elif risk == 'green' %}🟢 低风险{% else %}⚫ 未知{% endif %}",
     "⟦mr_goplus⟧", 1),
    ('{{ "%.1f%%" | format(card_data.buy_tax) if card_data.buy_tax '
     'is defined else "-" }}', "⟦buy_tax⟧", 1),
    ('{{ "%.1f%%" | format(card_data.sell_tax) if card_data.sell_tax '
     'is defined else "-" }}', "⟦sell_tax⟧", 1),
    ('{{ "%d 天" | format(card_data.lp_lock_days) if card_data.lp_lock_days '
     'is defined and card_data.lp_lock_days > 0 else "未锁定" }}',
     "⟦lp_lock⟧", 1),
    ('{% if card_data.honeypot is defined %}{{ "是" if card_data.honeypot '
     "else \"否\" }}{% else %}未知{% endif %}", "⟦honeypot⟧", 1),
    ("{{ card_data.sources.security_source if card_data.sources is defined "
     "and card_data.sources.security_source is defined else "
     "card_data.risk_source | default('-') }}", "⟦mr_sec_src⟧", 1),
    (DEGRADE_ALERT, "⟦degrade_alert⟧", 1),
    ("{{ card_data.verify_path | default('/') }}", "⟦verify_def⟧", 1),
    ("{{ card_data.data_as_of | default('N/A') }}", "⟦asof_def⟧", 1),
    ('{{ card_data.legal_note | default("本信息仅为风险线索与技术判断，不构成投资建议。") }}',
     "⟦legal_def⟧", 1),
]


def convert(template, rules, out_name):
    with open(f"{REF}/{template}", encoding="utf-8") as f:
        text = f.read()
    for old, new, count in rules:
        found = text.count(old)
        assert found == count, (
            f"{template}: expected {count}x, found {found}x: {old[:80]!r}")
        text = text.replace(old, new)
    for bad in ("{%", "{{", "{#"):
        assert bad not in text, (
            f"{template}: unconsumed Jinja syntax {bad!r} at "
            f"{text[text.index(bad):text.index(bad) + 120]!r}")
    os.makedirs(OUT, exist_ok=True)
    with open(f"{OUT}/{out_name}", "w", encoding="utf-8") as f:
        f.write(text)
    print(f"wrote {OUT}/{out_name} ({len(text)} chars)")


if __name__ == "__main__":
    convert("primary_card.ui.j2", PRIMARY, "primary_card.ui.seg")
    convert("topic_card.ui.j2", TOPIC, "topic_card.ui.seg")
    convert("market_risk_card.ui.j2", MARKET_RISK, "market_risk_card.ui.seg")
