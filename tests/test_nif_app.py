"""NIF formatter round-trip + HTTP annotation API end-to-end."""

import json
import urllib.request

import numpy as np
import pyarrow as pa
import pytest


def _entities():
    return pa.Table.from_pylist(
        [
            {
                "id": "Q686",
                "label": "Vanuatu",
                "aliases": ["Republic of Vanuatu"],
                "extra_aliases": [],
                "edges": [30],
                "nb_statements": 10,
                "nb_sitelinks": 5,
            },
            {
                "id": "Q30",
                "label": "United States",
                "aliases": ["USA"],
                "extra_aliases": [],
                "edges": [686],
                "nb_statements": 50,
                "nb_sitelinks": 20,
            },
        ],
        schema=pa.schema(
            [
                ("id", pa.string()),
                ("label", pa.string()),
                ("aliases", pa.list_(pa.string())),
                ("extra_aliases", pa.list_(pa.string())),
                ("edges", pa.list_(pa.int64())),
                ("nb_statements", pa.int32()),
                ("nb_sitelinks", pa.int32()),
            ]
        ),
    )


@pytest.fixture(scope="module")
def service():
    from opentapioca_ray.app import AnnotationService
    from opentapioca_ray.state.bow import BOWLanguageModel
    from opentapioca_ray.state.graph import pagerank_from_vector

    bow = BOWLanguageModel.from_counts({"live": 5, "in": 9}, 20)
    graph = pagerank_from_vector(np.ones(1000) / 1000.0)
    return AnnotationService(_entities(), bow, graph)


def test_annotate_service(service):
    out = service.annotate("I live in Vanuatu")
    assert out["annotations"], "Vanuatu should be tagged"
    m = out["annotations"][0]
    # reference golden offsets [10, 17] (test_taggerfactory.py:70-71)
    assert (m["start"], m["end"]) == (10, 17)
    assert m["best_qid"] == "Q686"


def test_nif_roundtrip(service):
    from opentapioca_ray.functions.nif import parse_nif_turtle

    text = "I live in Vanuatu"
    ttl = service.nif(text, doc_uri="http://example.org/doc1")
    ctxs = parse_nif_turtle(ttl)
    assert len(ctxs) == 1
    assert ctxs[0]["text"] == text
    assert ctxs[0]["phrases"] == [
        {"begin": 10, "end": 17, "phrase": "Vanuatu", "gold_qid": "Q686"}
    ]


def test_http_api(service):
    from opentapioca_ray.app import serve

    server, _ = serve(service)
    port = server.server_address[1]
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/annotate?text=I%20live%20in%20Vanuatu"
        ) as resp:
            data = json.loads(resp.read())
        assert data["annotations"][0]["best_qid"] == "Q686"

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/nif",
            data=json.dumps({"text": "I live in Vanuatu"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as resp:
            ttl = resp.read().decode()
        assert "taIdentRef" in ttl and "Q686" in ttl

        with urllib.request.urlopen(f"http://127.0.0.1:{port}/nope") as resp:
            pass
    except urllib.error.HTTPError as e:
        assert e.code == 404
    finally:
        server.shutdown()


def test_nif_parse_reference_style():
    """Parse a fragment in the style the ISTEX/RSS-500 corpora use."""
    from opentapioca_ray.functions.nif import parse_nif_turtle

    ttl = """@prefix nif: <http://persistence.uni-leipzig.org/nlp2rdf/ontologies/nif-core#> .
@prefix itsrdf: <http://www.w3.org/2005/11/its/rdf#> .

<http://example.org/c1#offset_0_25> a nif:Context, nif:OffsetBasedString ;
    nif:isString "Paris is a lovely capital"^^xsd:string ;
    nif:beginIndex "0"^^xsd:nonNegativeInteger ;
    nif:endIndex "25"^^xsd:nonNegativeInteger .

<http://example.org/c1#offset_0_5> a nif:OffsetBasedString, nif:Phrase ;
    nif:anchorOf "Paris"^^xsd:string ;
    nif:beginIndex "0"^^xsd:nonNegativeInteger ;
    nif:endIndex "5"^^xsd:nonNegativeInteger ;
    nif:referenceContext <http://example.org/c1#offset_0_25> ;
    itsrdf:taIdentRef <http://www.wikidata.org/entity/Q90> .
"""
    ctxs = parse_nif_turtle(ttl)
    assert len(ctxs) == 1
    assert ctxs[0]["phrases"][0]["gold_qid"] == "Q90"
    assert ctxs[0]["phrases"][0]["begin"] == 0
