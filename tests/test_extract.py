"""Rule-level goldens for the HTML extractor, one per DemoHTMLParser rule
(benchmark/.../feeds/DemoHTMLParser.java:63-163)."""

import pyarrow as pa
import pytest

from engine.extract import FramesetError, extract, extract_batch


def test_title_trim_and_head_scope():
    ex = extract("<html><head><title>  Hello World </title></head><body>x</body></html>")
    assert ex.title == "Hello World"
    assert ex.body == "x"


def test_title_outside_head_ignored():
    ex = extract("<html><body><title>nope</title>real</body></html>")
    assert ex.title == ""
    assert "real" in ex.body
    # <title> is not an ENDLINE element; its chars inside body count as body text
    assert ex.body == "nopereal"


def test_endline_elements_append_newline_at_end():
    ex = extract("<html><body><p>one</p><div>two</div>tail</body></html>")
    assert ex.body == "one\ntwo\ntail"


def test_br_hr_void_elements_newline():
    ex = extract("<html><body>a<br>b<hr/>c</body></html>")
    assert ex.body == "a\nb\nc"


def test_nested_blocks():
    ex = extract("<html><body><ul><li>a</li><li>b</li></ul></body></html>")
    assert ex.body == "a\nb\n\n"  # each li ends + ul ends


def test_script_style_suppressed():
    ex = extract(
        "<html><body>A<script>var x = '<b>not text</b>';</script>"
        "B<style>p { color: red }</style>C</body></html>"
    )
    assert ex.body == "ABC"


def test_img_alt_brackets():
    ex = extract('<html><body>see <img src="x.png" alt="a cat"> here</body></html>')
    assert ex.body == "see [a cat] here"
    ex2 = extract('<html><body>see <img src="x.png"> here</body></html>')
    assert ex2.body == "see  here"


def test_meta_name_and_http_equiv_lowercased_key():
    ex = extract(
        '<html><head><meta NAME="Keywords" content="a,b">'
        '<meta http-equiv="Content-Type" content="text/html"></head><body></body></html>'
    )
    assert ex.meta == {"keywords": "a,b", "content-type": "text/html"}


def test_meta_without_content_ignored():
    ex = extract('<html><head><meta name="x"></head><body></body></html>')
    assert ex.meta == {}


def test_text_outside_body_dropped():
    ex = extract("<html>before<body>inside</body>after</html>")
    assert ex.body == "inside"


def test_entities_decoded():
    ex = extract("<html><body>a &amp; b &lt;tag&gt; &#65;&#x42;</body></html>")
    assert ex.body == "a & b <tag> AB"


def test_entities_in_attrs():
    ex = extract('<html><body><img alt="x &amp; y"></body></html>')
    assert ex.body == "[x & y]"


def test_frameset_rejected():
    with pytest.raises(FramesetError):
        extract("<html><frameset><frame src='a'></frameset></html>")


def test_comments_and_doctype_skipped():
    ex = extract("<!DOCTYPE html><html><body>a<!-- hidden <p>x</p> -->b</body></html>")
    assert ex.body == "ab"


def test_unclosed_tags_no_balancing():
    # event-stream semantics: unclosed <p> produces no newline (no end event)
    ex = extract("<html><body><p>dangling</body></html>")
    assert ex.body == "dangling"


def test_unclosed_script_swallows_rest():
    ex = extract("<html><body>a<script>nope")
    assert ex.body == "a"


def test_stray_lt_is_text():
    ex = extract("<html><body>1 < 2 ok</body></html>")
    assert ex.body == "1 < 2 ok"


def test_bytes_input():
    ex = extract("<html><body>héllo</body></html>".encode("utf-8"))
    assert ex.body == "héllo"


def test_extract_batch_arrow():
    tbl = pa.table(
        {
            "url": ["u1", "u2"],
            "html": [
                b"<html><head><title>T</title></head><body><p>hi</p></body></html>",
                b"<html><frameset></frameset></html>",
            ],
        }
    )
    out = extract_batch(tbl)
    assert out.column_names == ["url", "html", "title", "text", "rejected"]
    assert out.column("title").to_pylist() == ["T", ""]
    assert out.column("text").to_pylist() == ["hi\n", ""]
    assert out.column("rejected").to_pylist() == [False, True]
