"""Deterministic synthetic corpus generator (FIXTURES.md sections 3-4).

Generates interleaved-document rows ``(doc_id, spans)`` embedding every
representative case the reference's fixtures exhibit: merged
multi-question text spans across the 5 number patterns, interleaved
related/decorative media, boilerplate kinds, exam-info strings,
false-positive numerals, mega-docs for skew, and degenerate docs.

Generation is per-doc seeded (seed + doc index), so the same corpus is
produced at any parallelism level / block split — required for the
two-parallelism-level scaling benchmark.
"""
from __future__ import annotations

import random
from typing import Any, Dict, List

import pyarrow as pa

from doc_ocr_ray.schema import DOCUMENTS_SCHEMA, SPAN_STRUCT

# bump when generation logic changes so cached bench corpora invalidate
SYNTH_VERSION = 1

_SUBJECTS = ["数学", "语文", "英语"]
_GRADES = ["三年级", "四年级", "五年级", "六年级"]
_SECTION_NAMES = ["一、填空题。", "二、判断题。", "三、选择题。", "四、计算题。", "五、解决问题。"]

_BODIES = [
    "一个长方形的长是8厘米，宽是5厘米，求它的周长和面积各是多少",
    "小明从家到学校的距离是1200米，他每分钟走80米，需要多少分钟",
    "计算下面各题，能简算的要简算：$\\frac{3}{4}+\\frac{1}{8}\\times 2$",
    "一个圆的半径是3厘米，它的周长是多少厘米？面积是多少平方厘米",
    "判断：所有的偶数都是合数。对的打√，错的打×",
    "甲数是乙数的$\\frac{2}{3}$，乙数比甲数多15，求甲数和乙数",
    "一桶油重10千克，用去$\\frac{2}{5}$后，还剩多少千克",
    "选择正确答案填在括号里：下列图形中对称轴最多的是",
]
_FIGURE_BODIES = [
    "如图，求阴影部分的面积（单位：厘米）",
    "观察图中的统计图，回答下列问题：全年平均气温是多少",
    "右图用乘法算式表示是$(\\frac{2}{3})\\times(\\frac{2}{5})$，请列式计算",
    "如图所示，一个梯形的上底是4厘米，下底是8厘米，求面积",
]
_FALSE_POSITIVE_TEXTS = [
    "一辆汽车的速度为 1.5m/s，行驶了 2.5 小时，路程约 13.5 千米。",
    "圆周率约为 3.1415926，保留两位小数是 3.14。",
]
_ASIDES = ["班级：___ 姓名：___ 考号：___", "装订线内不要答题", "得分：____"]


def _question_text(rng: random.Random, number: int, pattern_idx: int,
                   with_figure: bool, score: int) -> str:
    """One question's text with its number token in the given pattern."""
    body = rng.choice(_FIGURE_BODIES if with_figure else _BODIES)
    token = [
        f"{number}.", f"({number})", f"第{number}题", f"[{number}]", f"【{number}】",
    ][pattern_idx]
    suffix = f"（{score}分）" if score else ""
    return f"{token}{body}。{suffix}"


def make_doc(doc_idx: int, seed: int = 42, mega: bool = False) -> Dict[str, Any]:
    """Build one deterministic document row."""
    rng = random.Random((seed << 20) ^ doc_idx)
    spans: List[Dict[str, Any]] = []
    img_seq = 0

    def add(kind: str, text: str = "", media: bool = False):
        nonlocal img_seq
        ref = ""
        if media:
            ref = f"img:{doc_idx}:{img_seq}"
            img_seq += 1
        spans.append({"kind": kind, "text": text, "media_ref": ref,
                      "offset": len(spans)})

    # degenerate docs (FIXTURES.md case 12)
    if not mega and doc_idx % 97 == 13:
        if doc_idx % 2:
            add("footer", "第1页")       # boilerplate-only doc
        return {"doc_id": f"synth-{doc_idx:06d}", "spans": spans}

    if rng.random() < 0.5:
        add("header", f"第{rng.randint(1, 9)}页")
    if rng.random() < 0.2:
        add("header_image")
    subject, grade = rng.choice(_SUBJECTS), rng.choice(_GRADES)
    add("doc_title", f"{grade}上册{subject}测试卷人教版")
    add("text", f"时间：{rng.choice([40, 60, 90])}分钟 满分：{rng.choice([100, 120])}分")
    if rng.random() < 0.3:
        add("aside_text", rng.choice(_ASIDES))

    n_sections = rng.randint(2, 4) if not mega else 40
    qnum = 0
    for s in range(n_sections):
        add("paragraph_title", _SECTION_NAMES[s % len(_SECTION_NAMES)])
        n_q = rng.randint(2, 5) if not mega else 25
        i = 0
        while i < n_q:
            qnum += 1
            roll = rng.random()
            if roll < 0.35 and i + 1 < n_q:
                # merged multi-question span (case 1/2): 2-5 consecutive
                # questions concatenated, newline- or inline-joined
                k = min(rng.randint(2, 5), n_q - i)
                pat = rng.choice([0, 0, 0, 1, 2, 3, 4])
                parts = [_question_text(rng, qnum + j, pat, False,
                                        rng.choice([0, 2, 3]))
                         for j in range(k)]
                joiner = "\n" if rng.random() < 0.5 else ""
                add("text", joiner.join(parts))
                qnum += k - 1
                i += k
            elif roll < 0.55:
                # figure question: text span + related image(s)
                n_img = rng.choice([1, 1, 1, 2, 3])
                add("text", _question_text(rng, qnum, 0, True,
                                           rng.choice([0, 2, 4])))
                for _ in range(n_img):
                    add("image", media=True)
                if rng.random() < 0.3:
                    add("display_formula", "$S=\\pi r^{2}$")
                i += 1
            else:
                # single plain question
                add("text", _question_text(rng, qnum, rng.choice([0, 0, 1]),
                                           False, rng.choice([0, 2, 5])))
                if rng.random() < 0.1:
                    add("table", "| a | b |\n|---|---|")
                i += 1
        if rng.random() < 0.25:
            # decorative image after a non-figure context -> rejected by
            # the classifier stand-in, lands in residual (case 8)
            add("image", media=True)
    if rng.random() < 0.3:
        add("text", rng.choice(_FALSE_POSITIVE_TEXTS))
    if rng.random() < 0.15:
        add("text", "")                 # empty text span (case 12)
    if rng.random() < 0.4:
        add("footer", f"{subject}试卷 共4页")
    return {"doc_id": f"synth-{doc_idx:06d}", "spans": spans}


def generate_table(num_docs: int, seed: int = 42,
                   mega_doc_every: int = 0) -> pa.Table:
    """Driver-side table of ``num_docs`` deterministic docs."""
    rows = [make_doc(i, seed, mega=(mega_doc_every > 0 and i % mega_doc_every == 0))
            for i in range(num_docs)]
    return pa.table(
        {"doc_id": pa.array([r["doc_id"] for r in rows], pa.string()),
         "spans": pa.array([r["spans"] for r in rows], pa.list_(SPAN_STRUCT))},
        schema=DOCUMENTS_SCHEMA)


def generate_dataset(num_docs: int, seed: int = 42, mega_doc_every: int = 0,
                     override_num_blocks: int = None, start: int = 0):
    """Distributed generation: ray.data.range -> map_batches builder.

    Each task builds only its id-range, seeded per doc — identical
    output at any parallelism (needed for the N-vs-4N bench runs).
    ``start`` offsets the id range so a sharded job generates disjoint
    slices of the same corpus.
    """
    import ray.data

    def build(batch: pa.Table) -> pa.Table:
        ids = [i + start for i in batch["id"].to_pylist()]
        rows = [make_doc(i, seed,
                         mega=(mega_doc_every > 0 and i % mega_doc_every == 0))
                for i in ids]
        return pa.table(
            {"doc_id": pa.array([r["doc_id"] for r in rows], pa.string()),
             "spans": pa.array([r["spans"] for r in rows],
                               pa.list_(SPAN_STRUCT))},
            schema=DOCUMENTS_SCHEMA)

    kwargs = {}
    if override_num_blocks:
        kwargs["override_num_blocks"] = override_num_blocks
    return ray.data.range(num_docs, **kwargs).map_batches(
        build, batch_format="pyarrow", batch_size=512)
