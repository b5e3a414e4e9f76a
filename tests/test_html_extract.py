"""HTML main-content extractor edge semantics the synthesized corpus
cannot exercise (pipelines/web.py): link-density boundary, entity
unescape, mixed-link blocks, chrome regions, invisible content."""

import pytest

from pdf_extract_kit_ray.pipelines.web import (SYNTH_CHROME_BLOCKS,
                                               extract_main_content,
                                               synth_html)


def test_roundtrip_invariant():
    text = " ".join(f"w{i}" for i in range(30))   # 30 tokens -> 3 paras
    main, kept, dropped = extract_main_content(synth_html(5, text))
    assert main.replace("\n", " ") == text
    assert kept == 3
    assert dropped == SYNTH_CHROME_BLOCKS


def test_empty_text_page():
    main, kept, dropped = extract_main_content(synth_html(0, ""))
    assert (main, kept, dropped) == ("", 0, SYNTH_CHROME_BLOCKS)


def test_link_density_boundary():
    # anchor text exactly half the block text: kept (<= 0.5)
    half = '<p><a href="/x">abcde</a>fghij</p>'
    main, kept, dropped = extract_main_content(half)
    assert (main, kept, dropped) == ("abcdefghij", 1, 0)
    # just over half: dropped
    over = '<p><a href="/x">abcdef</a>ghij</p>'
    assert extract_main_content(over) == ("", 0, 1)


def test_mixed_block_keeps_anchor_text():
    page = '<p>see <a href="/d">the docs</a> for details of everything</p>'
    main, kept, _ = extract_main_content(page)
    assert main == "see the docs for details of everything"
    assert kept == 1


def test_entities_unescaped():
    main, _, _ = extract_main_content("<p>a &amp; b &lt;c&gt;</p>")
    assert main == "a & b <c>"


def test_heading_and_td_blocks():
    page = ("<h2>Results</h2><table><tr><td>cell one</td>"
            "<td>cell two</td></tr></table>")
    main, kept, dropped = extract_main_content(page)
    assert main == "Results\ncell one\ncell two"
    assert (kept, dropped) == (3, 0)


def test_chrome_regions_dropped():
    page = ("<nav><ul><li>plenty of plain nav text no links</li></ul></nav>"
            "<p>content paragraph</p>"
            "<footer><p>long copyright text with no links at all</p></footer>")
    main, kept, dropped = extract_main_content(page)
    assert main == "content paragraph"
    assert (kept, dropped) == (1, 2)


def test_script_style_comment_invisible():
    page = ("<script>var p = '<p>fake</p>';</script>"
            "<style>p { color: red }</style>"
            "<!-- <p>commented out</p> -->"
            "<p>real</p>")
    main, kept, dropped = extract_main_content(page)
    assert (main, kept, dropped) == ("real", 1, 0)


def test_whitespace_only_block_dropped():
    assert extract_main_content("<p>   </p><p>x y</p>") == ("x y", 1, 1)


def test_case_insensitive_tags():
    page = "<NAV><LI>chrome</LI></NAV><P>Body Text</P>"
    main, kept, dropped = extract_main_content(page)
    assert (main, kept, dropped) == ("Body Text", 1, 1)
