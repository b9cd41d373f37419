"""Namespace / vocabulary constants.

Mirrors the namespace prefix table of the reference
(``ferenda/documentrepository.py:167-191``) for the vocabularies this
engine actually emits; everything is a plain string — no rdflib.
"""

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
OWL = "http://www.w3.org/2002/07/owl#"
XSD = "http://www.w3.org/2001/XMLSchema#"
DCTERMS = "http://purl.org/dc/terms/"
PROV = "http://www.w3.org/ns/prov#"
BIBO = "http://purl.org/ontology/bibo/"
SKOS = "http://www.w3.org/2004/02/skos/core#"
FOAF = "http://xmlns.com/foaf/0.1/"
# engine-private vocabulary (lineage etc.)
FR = "https://ferenda-ray.dev/ns#"

PREFIXES = {
    "rdf": RDF,
    "rdfs": RDFS,
    "owl": OWL,
    "xsd": XSD,
    "dcterms": DCTERMS,
    "prov": PROV,
    "bibo": BIBO,
    "skos": SKOS,
    "foaf": FOAF,
    "fr": FR,
}

# frequently-used curies, pre-expanded
RDF_TYPE = RDF + "type"
RDFS_LABEL = RDFS + "label"
OWL_SAMEAS = OWL + "sameAs"
DCTERMS_TITLE = DCTERMS + "title"
DCTERMS_IDENTIFIER = DCTERMS + "identifier"
DCTERMS_LANGUAGE = DCTERMS + "language"
DCTERMS_ISPARTOF = DCTERMS + "isPartOf"
DCTERMS_REFERENCES = DCTERMS + "references"
DCTERMS_SUBJECT = DCTERMS + "subject"
DCTERMS_ISSUED = DCTERMS + "issued"
DCTERMS_PUBLISHER = DCTERMS + "publisher"
DCTERMS_EXTENT = DCTERMS + "extent"
PROV_WASGENERATEDBY = PROV + "wasGeneratedBy"
BIBO_DOCUMENT = BIBO + "Document"
BIBO_DOCUMENTPART = BIBO + "DocumentPart"
BIBO_CHAPTER = BIBO + "chapter"
SKOS_ALTLABEL = SKOS + "altLabel"
SKOS_PREFLABEL = SKOS + "prefLabel"
FR_CONTENT_SHA256 = FR + "contentSha256"
FR_MENTIONS = FR + "mentions"
FR_LANG = FR + "sourceLang"

XSD_INTEGER = XSD + "integer"
XSD_DATE = XSD + "date"
XSD_GYEARMONTH = XSD + "gYearMonth"


def qname(uri: str) -> str:
    """Compact a full URI to prefix:local when a known prefix matches.

    Semantics of ``Facet.qname`` (``ferenda/facet.py:313-331``).
    """
    for prefix, base in PREFIXES.items():
        if uri.startswith(base):
            return f"{prefix}:{uri[len(base):]}"
    return uri


# every predicate the engine itself emits (extract/link/canonicalize) —
# the static exchange vocabulary for materialize's compact encoding
ENGINE_PREDICATES = [
    RDF_TYPE, RDFS_LABEL, OWL_SAMEAS,
    DCTERMS_TITLE, DCTERMS_IDENTIFIER, DCTERMS_LANGUAGE,
    DCTERMS_ISPARTOF, DCTERMS_REFERENCES, DCTERMS_SUBJECT,
    DCTERMS_ISSUED, DCTERMS_PUBLISHER, DCTERMS_EXTENT,
    DCTERMS + "creator", DCTERMS + "requires",
    PROV_WASGENERATEDBY, BIBO_CHAPTER,
    SKOS_ALTLABEL, SKOS_PREFLABEL,
    FR_CONTENT_SHA256, FR_MENTIONS, FR_LANG, FR + "parseError",
]
