"""Property-based tests (hypothesis) for the conformance-critical kernels:
strip arithmetic invariants, normalize idempotence, reading-order totality,
clamp/crop safety — over much wider input ranges than the example tests."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_platform_ray import font
from ocr_platform_ray.kernels import order, recognizek
from ocr_platform_ray.kernels.preprocess import resize_dims
from ocr_platform_ray.kernels.textnorm import normalize_text

boxes_st = st.lists(
    st.tuples(
        st.integers(-50, 500), st.integers(-50, 500),
        st.integers(-50, 500), st.integers(-50, 500),
    ),
    max_size=20,
)


class TestStripProperties:
    @given(h=st.integers(1, 2000), oh=st.one_of(st.none(), st.integers(1, 4000)))
    @settings(max_examples=300, deadline=None)
    def test_bounds_within_crop_and_min_height(self, h, oh):
        strips = recognizek.strip_bounds(h, oh)
        for (y1, y2) in strips:
            assert 0 <= y1 < y2 <= max(h, 1)
        # multi-strip mode enforces the 8px floor; single full-crop strip
        # (short crop) may be shorter
        if len(strips) > 1:
            assert all(y2 - y1 >= recognizek.MIN_STRIP_PX for y1, y2 in strips)

    @given(h=st.integers(recognizek.MIN_STRIP_PX, 2000))
    @settings(max_examples=200, deadline=None)
    def test_crop_mode_covers_crop(self, h):
        strips = recognizek.strip_bounds(h, None)
        assert strips[0][0] == 0
        # reference semantics: a trailing strip shorter than 8 px is DROPPED
        # (vietocr_engine.py:96-99), so up to 7 px of tail may be uncovered
        assert strips[-1][1] >= h - 7
        # consecutive strips overlap or touch (no gap): next y1 <= prev y2
        for (a, b) in zip(strips, strips[1:]):
            assert b[0] <= a[1]

    @given(oh=st.integers(57, 4000))
    @settings(max_examples=200, deadline=None)
    def test_original_mode_strip_count(self, oh):
        strips = recognizek.strip_bounds(oh, oh)  # unscaled crop
        assert len(strips) <= max(1, round(oh / 32))


class TestClampProperties:
    @given(box=st.tuples(*[st.integers(-100, 600)] * 4))
    @settings(max_examples=200, deadline=None)
    def test_clamp_invariants(self, box):
        x1, y1, x2, y2 = recognizek.clamp_box(box)
        assert x1 >= 0 and y1 >= 0 and x2 > x1 and y2 > y1

    @given(box=st.tuples(*[st.integers(-100, 600)] * 4))
    @settings(max_examples=100, deadline=None)
    def test_crop_shape_matches_clamp(self, box):
        img = np.zeros((64, 64), dtype=np.uint8)
        x1, y1, x2, y2 = recognizek.clamp_box(box)
        assert recognizek.crop(img, box).shape == (y2 - y1, x2 - x1)


class TestOrderProperties:
    @given(boxes=boxes_st)
    @settings(max_examples=200, deadline=None)
    def test_permutation(self, boxes):
        idx = order.reading_order(boxes)
        assert sorted(idx) == list(range(len(boxes)))

    @given(boxes=boxes_st)
    @settings(max_examples=100, deadline=None)
    def test_deterministic(self, boxes):
        assert order.reading_order(boxes) == order.reading_order(boxes)


class TestNormalizeProperties:
    @given(s=st.text(max_size=200))
    @settings(max_examples=300, deadline=None)
    def test_idempotent(self, s):
        once = normalize_text(s)
        assert normalize_text(once) == once

    @given(s=st.text(alphabet=" \t\n\rab", max_size=100))
    @settings(max_examples=100, deadline=None)
    def test_no_edge_or_double_spaces(self, s):
        out = normalize_text(s)
        assert out == out.strip()
        assert "  " not in out


class TestPreprocessProperties:
    @given(w=st.integers(1, 5000), h=st.integers(1, 5000),
           m=st.integers(10, 2400))
    @settings(max_examples=300, deadline=None)
    def test_resize_bound_and_monotone(self, w, h, m):
        nw, nh = resize_dims(w, h, m)
        assert max(nw, nh) <= max(max(w, h), m)
        if max(w, h) > m:
            assert max(nw, nh) <= m
        else:
            assert (nw, nh) == (w, h)


class TestFontProperties:
    @given(
        words=st.lists(
            st.text(alphabet=font.CHARSET.replace(" ", ""), min_size=1, max_size=6),
            min_size=1, max_size=4,
        ),
        s=st.integers(1, 4),
    )
    @settings(max_examples=150, deadline=None)
    def test_render_decode_roundtrip(self, words, s):
        text = " ".join(words)
        img = font.render_line(text, s)
        got, conf = font.decode_band(img > 127)
        assert got == text
        assert conf == 1.0
