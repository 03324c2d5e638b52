"""CSV/JSONL source connectors: exact roundtrip vs the parquet table and
loud failure on schema violations."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
def test_csv_and_jsonl_roundtrip_exact(sf_dir, tmp_path):
    import duckdb

    from entity_extractor_ray.sources.tabular import (
        export_documents_csv,
        export_documents_jsonl,
        read_documents_csv,
        read_documents_jsonl,
    )

    csvp = export_documents_csv(sf_dir, str(tmp_path / "documents.csv"))
    jlp = export_documents_jsonl(sf_dir, str(tmp_path / "documents.jsonl"))
    ref = duckdb.sql(
        f"SELECT * FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).df()
    a = read_documents_csv(csvp).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = read_documents_jsonl(jlp).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(ref)
    assert b.equals(ref)


@pytest.mark.usefixtures("ray_session")
def test_cast_to_schema_raises_on_missing_column():
    import ray.data as rd

    from entity_extractor_ray.sources.tabular import DOCUMENTS_SCHEMA, cast_to_schema

    bad = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["x"]}))
    with pytest.raises(Exception):
        cast_to_schema(bad, DOCUMENTS_SCHEMA).take_all()


@pytest.mark.usefixtures("ray_session")
def test_cast_to_schema_coerces_compatible_types():
    import ray.data as rd

    from entity_extractor_ray.sources.tabular import DOCUMENTS_SCHEMA, cast_to_schema

    df = pd.DataFrame(
        {
            "doc_id": np.array([1, 2], dtype=np.int32),  # narrower int widens
            "text": ["a", "b"],
            "lang": ["en", "fr"],
            "source": ["s", "s"],
            "n_chars": np.array([1, 1], dtype=np.int32),
        }
    )
    out = cast_to_schema(rd.from_pandas(df), DOCUMENTS_SCHEMA)
    tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    assert tbl.schema.field("doc_id").type == pa.int64()
