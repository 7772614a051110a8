"""Planted pin for round-5 batch 50: per-language tokenizer fertility.
Registry equality vs DuckDB at sf0.01/sf0.1 is swept by
tools/check_correctness.py."""

import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.textstats import tokenizer_fertility


def test_tokenizer_fertility_planted():
    docs = rd.from_arrow(
        pa.table(
            {
                "lang": pa.array(["en", "en", "xx"], pa.string()),
                # "ab cd" -> tokens [ab, " cd"] = 2; "e" -> 1
                "text": pa.array(["ab cd", "e", ""], pa.string()),
            }
        )
    )
    out = tokenizer_fertility(docs).to_pandas().set_index("lang")
    assert out.loc["en", "n_docs"] == 2
    assert out.loc["en", "n_tokens"] == 3
    # chars 5 + 1 = 6 over 3 tokens
    assert out.loc["en", "chars_per_token"] == 2.0
    assert out.loc["en", "tokens_per_doc"] == 1.5
    # token-free language: NULL chars_per_token, 0 tokens/doc
    assert out.loc["xx", "n_tokens"] == 0
    assert out.loc["xx"].isna()["chars_per_token"]
    assert out.loc["xx", "tokens_per_doc"] == 0.0
