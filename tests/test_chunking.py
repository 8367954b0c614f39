"""chunk_documents: fixed-token-window chunking with overlap."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from neo4j_graph_algorithms_ray.pipelines.text_analysis import chunk_documents


def _reference(df: pd.DataFrame, chunk: int, overlap: int) -> pd.DataFrame:
    stride = chunk - overlap
    rows = []
    for _, r in df.iterrows():
        tk = r["text"].split()
        if not tk:
            continue
        j = 0
        while True:
            ch = tk[j * stride : j * stride + chunk]
            rows.append((r["doc_id"], j, " ".join(ch), len(ch)))
            if j * stride + chunk >= len(tk):
                break
            j += 1
    return pd.DataFrame(rows, columns=["doc_id", "chunk_id", "text", "n_tokens"])


@pytest.mark.parametrize("chunk,overlap", [(8, 3), (8, 0), (5, 4)])
def test_chunking_matches_reference_loop(chunk, overlap):
    rng = np.random.default_rng(5)
    texts = []
    for i in range(120):
        n = int(rng.integers(0, 30))
        texts.append(
            " ".join(f"t{i}_{j}" for j in range(n))
            + ("  \n " if i % 3 == 0 else "")
        )
    texts += ["", "   \n  "]  # empty + whitespace-only docs -> no rows
    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    out = (
        chunk_documents(rd.from_pandas(df), chunk, overlap)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    ref = (
        _reference(df, chunk, overlap)
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, ref.astype(out.dtypes.to_dict()))


def test_chunking_short_doc_single_chunk():
    df = pd.DataFrame({"doc_id": [7], "text": ["a b c"]})
    out = chunk_documents(rd.from_pandas(df), 512, 64).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["text"] == "a b c"
    assert out.iloc[0]["n_tokens"] == 3
    assert out.iloc[0]["chunk_id"] == 0


def test_chunking_overlap_validation():
    df = pd.DataFrame({"doc_id": [0], "text": ["a"]})
    with pytest.raises(ValueError):
        chunk_documents(rd.from_pandas(df), 8, 8)
    with pytest.raises(ValueError):
        chunk_documents(rd.from_pandas(df), 8, -1)
