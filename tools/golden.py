#!/usr/bin/env python3
"""Golden-oracle generator for the governance (02/02_x01) layer.

Loads the REFERENCE's own transform functions (pure python, no Mongo) from
/root/reference, runs them over the fixture corpus defined here, and emits:

  - src/main/resources/graft/gov/landing.jsonl   (fixture landing docs)
  - src/main/scala/graft/gov/GovOracle.scala     (DuckDB VALUES oracles)

The engine's Spark implementation is then gate-checked against the
reference's actual behavior, not our reading of it. Run from /root/repo:
    python3 tools/golden.py
"""
import importlib.util
import json
import sys
import types
import os
import datetime as _dt

REF = "/root/reference/dags/data_governance"

# ---- stub the airflow/pymongo imports the reference modules pull in ----
def _stub(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m

class _Any:
    def __init__(self, *a, **k): pass
    def __call__(self, *a, **k): return self
    def __getattr__(self, k): return _Any()
    def __enter__(self): return self
    def __exit__(self, *a): return False
    def __rshift__(self, o): return self
    def __lshift__(self, o): return self

for mod in ["airflow", "airflow.operators", "airflow.operators.python",
            "airflow.providers", "airflow.providers.mongo",
            "airflow.providers.mongo.hooks", "airflow.providers.mongo.hooks.mongo",
            "airflow.hooks", "airflow.hooks.filesystem",
            "airflow.providers.sftp", "airflow.providers.sftp.hooks",
            "airflow.providers.sftp.hooks.sftp",
            "pymongo"]:
    _stub(mod, DAG=_Any, PythonOperator=_Any, MongoHook=_Any, FSHook=_Any,
          SFTPHook=_Any, ReplaceOne=_Any, UpdateOne=_Any)

def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec)
    sys.modules[name] = m
    spec.loader.exec_module(m)
    return m

misc = _load("dg_misc", f"{REF}/misc.py")
pkg = _stub("data_governance")
pkg2 = _stub("data_governance.dags")
pkg3 = _stub("data_governance.dags.data_governance")
sys.modules["data_governance.dags.data_governance.misc"] = misc
m02 = _load("dg_02", f"{REF}/02_create_iahx_xml_collection.py")
m02x = _load("dg_02x", f"{REF}/02_x01_create_iahx_xml_collection.py")

class _FakeDT(_dt.datetime):
    @classmethod
    def now(cls, tz=None):
        return cls(2026, 1, 15, 12, 0, 0)
m02.datetime = _FakeDT  # pin the weight clock (X16)

# ---------------- lookup fixtures (TABS/DECS/TITLE) ----------------
TABPAIS = [
    {"all": {"pt": "Brasil", "en": "Brazil", "es": "Brasil", "fr": "Brésil",
             "país_2": "BR", "sinonimo": ["Brazil (BR)"]}},
    {"all": {"pt": "estados unidos da américa", "en": "united states of america",
             "es": "estados unidos", "fr": "états-unis", "país_2": "US",
             "sinonimo": ["united states"]}},
]
DECS = [
    {"Mfn": "012345", "Descritor Inglês": "Traditional Medicine",
     "Descritor Português": "Medicina Tradicional",
     "Descritor Espanhol": "Medicina Tradicional",
     "Descritor Francês": "Médecine traditionnelle",
     "Descritor Espanhol-Espanha": "", "Versão Alternativa Inglês": "",
     "Versão Alternativa Espanhol": "", "Versão Alternativa Português": "",
     "Sinônimos Inglês": []},
    {"Mfn": "000022", "Descritor Inglês": "/history",
     "Descritor Português": "/história", "Descritor Espanhol": "/historia",
     "Descritor Francês": "", "Descritor Espanhol-Espanha": "",
     "Versão Alternativa Inglês": "", "Versão Alternativa Espanhol": "",
     "Versão Alternativa Português": "", "Sinônimos Inglês": []},
    {"Mfn": "007500", "Descritor Inglês": "Humans",
     "Descritor Português": "Humanos", "Descritor Espanhol": "Humanos",
     "Descritor Francês": "Humains", "Descritor Espanhol-Espanha": "",
     "Versão Alternativa Inglês": "", "Versão Alternativa Espanhol": "",
     "Versão Alternativa Português": "", "Sinônimos Inglês": ["Human beings"]},
    {"Mfn": "036666", "Descritor Inglês": "Systematic Review",
     "Descritor Português": "Revisão Sistemática",
     "Descritor Espanhol": "Revisión Sistemática", "Descritor Francês": "",
     "Descritor Espanhol-Espanha": "", "Versão Alternativa Inglês": "",
     "Versão Alternativa Espanhol": "", "Versão Alternativa Português": "",
     "Sinônimos Inglês": []},
]
TITLE = [
    {"issn": "0034-8910", "title": "Revista de Saúde Pública^nota",
     "shortened_title": "Rev. Saúde Pública",
     "medline_shortened_title": "Rev Saude Publica",
     "parallel_titles": ["Journal of Public Health^x"],
     "shortened_parallel_titles": [], "other_titles": [],
     "country": ["Brasil"]},
]
AI_MAP_ROWS = [{"ai1": "Organização Z", "ai2": "Organizacao Z Renamed"}]

class _Cur:
    def __init__(self, rows): self.rows = rows
    def find(self, *a, **k): return list(self.rows)

country_map = misc.load_tabpais(_Cur(TABPAIS))
decs_map = misc.load_decs_descriptors(_Cur(DECS))
issn_map, short_map = misc.load_title_current(_Cur(TITLE))
short_country = misc.load_title_current_country(_Cur(TITLE))
ai_map = {m02x._norm_key(r["ai1"]): r["ai2"] for r in AI_MAP_ROWS}

# ---------------- fixture landing docs ----------------
def doc(**kw):
    d = {
        "id": None, "LILACS_original_id": "", "status": None,
        "treatment_level": "", "literature_type": "",
        "cooperative_center_code": "",
        "title": [], "title_collection": [],
        "english_translated_title": "", "english_title_monographic": "",
        "english_title_collection": "",
        "title_serial": "", "shortened_title": "", "issn": "",
        "volume_serial": "", "issue_number": "", "volume_monographic": "",
        "pages_monographic": "",
        "abstract": [], "electronic_address": [],
        "author_keyword": [], "check_tags": [], "publication_type": [],
        "descriptors_primary": [], "descriptors_secondary": [],
        "local_descriptors": "", "publication_country": "",
        "publication_city": "", "publisher": "", "edition": "",
        "publication_date": "", "publication_date_normalized": "",
        "descriptive_information": [], "symbol": [],
        "text_language": [], "database": [], "indexed_database": [],
        "community": [], "community_collection_path": [],
        "doi_number": "", "isbn": "", "alternate_ids": [],
        "related_research": [], "related_resource": [],
        "clinical_trial_registry_name": "",
        "call_number": [], "inventory_number": "",
        "total_number_of_volumes": "",
        "thesis_dissertation_institution": "",
        "thesis_dissertation_leader": [],
        "thesis_dissertation_academic_title": "",
        "conference_name": "", "conference_city": "", "conference_country": "",
        "conference_date": "", "conference_normalized_date": "",
        "conference_sponsoring_institution": "",
        "project_name": "", "project_number": "",
        "project_sponsoring_institution": "",
        "license": "", "non_decs_region": "",
        "updated_time": "",
    }
    # Presence-sensitive keys (reference checks `'k' in doc`, not truthiness):
    # pages, title_monographic, the six author fields, created_time,
    # transfer_date_to_database. These are ABSENT unless a fixture doc sets
    # them — landing.jsonl then omits the key and the Scala Landing reads
    # null (= key absent) vs ""/[] (= present-empty).
    d.update(kw)
    return d

def au(text="", i1="", i2="", i3="", p="", c="", k="", w="", e=""):
    return {"text": text, "_1": i1, "_2": i2, "_3": i3, "_p": p, "_c": c,
            "_k": k, "_w": w, "_e": e}

DOCS = [
    doc(id=1001, LILACS_original_id="839300", status=1, treatment_level="as",
        literature_type="s", cooperative_center_code="BR1.1",
        title=[{"text": "Título em português", "_i": "pt"}],
        english_translated_title="Title in English",
        title_serial="Rev. Saúde Pública", issn="0034-8910",
        volume_serial="58", issue_number="3",
        pages=[{"_f": "123", "_l": "130", "text": "", "_e": ""}],
        abstract=[{"text": "Resumo inicial\r\ncontinua", "_i": "pt"},
                  {"text": "Abstract text", "_i": "en"},
                  {"text": "mais resumo", "_i": "pt"}],
        electronic_address=[{"_u": "https://example.org/a.pdf", "_y": "PDF",
                             "_q": "pdf", "_x": "meta", "_z": ""}],
        individual_author=[
            au("Silva, Ana", "Universidade X", "Faculdade Y", "", "Brasil",
               "São Paulo", "0000-0001", "", "ana@x.br"),
            au("Souza, Bruno", "", "", "", "united states", "", "", "K2", "")],
        author_keyword=[{"text": "saúde pública", "_i": "pt"}],
        check_tags=["Humans"], publication_type=["Systematic Review"],
        descriptors_primary=[{"text": "Medicina Tradicional/história"}],
        descriptors_secondary=[{"text": "^d12345"}],
        local_descriptors="TERMO1\nTERMO2",
        publication_country="Brasil", publication_city="São Paulo",
        publisher="Editora W", edition="2. ed",
        publication_date="jul. 2024", publication_date_normalized="20240701",
        descriptive_information=[{"_b": "ilus"}, {"_b": "tab"}],
        text_language=["pt", "en"], database=["LILACS", "BDENF"],
        indexed_database=["lilacs"],
        community=["SUS Digital"],
        community_collection_path=["SUS|pt-br^Programas/Tema A",
                                    "SUS|pt^Público Alvo/Tema B"],
        doi_number="10.1000/xyz", alternate_ids=["biblio-999", "lil-839300"],
        related_research=["RR1"], clinical_trial_registry_name="ReBEC",
        call_number=[{"text": "WB 50", "_a": "BR1.1", "_b": "setor",
                      "_6": "extra"}],
        inventory_number="123",
        created_time="2024-07-02T10:00:00", updated_time="2026-07-01T12:00:00",
        transfer_date_to_database="2024-07-02"),
    doc(id=1002, status=0, treatment_level="am", literature_type="s",
        individual_author_monographic=[au("Org, Ana", "Inst M")],
        title_monographic=[{"text": "Capítulo Um", "_i": "pt"}],
        english_title_monographic="Chapter One",
        pages=[{"_f": "45", "_l": "60", "text": "", "_e": ""}],
        publication_city="Lima", publisher="Editorial P",
        publication_date="2020", publication_date_normalized="20200101",
        title_serial="Serie Salud", volume_serial="7", symbol=["SYM1"],
        publication_country="Brasil",
        created_time="2020-01-01T00:00:00", updated_time="2020-02-02T00:00:00"),
    doc(id=1003, status=-2, treatment_level="mc", literature_type="mc",
        corporate_author_monographic=[au("Ministerio de Salud")],
        title_monographic=[{"text": "Informe Anual", "_i": "es"}],
        title_collection=[{"text": "Colección General", "_i": "es"}],
        pages_monographic="350 p.",
        publication_city="Bogotá", publisher="Ed Q", edition="1 ed",
        publication_date="2019", publication_date_normalized="20190101",
        publication_country="",
        created_time="2019-01-01T00:00:00", updated_time="2019-02-02T00:00:00"),
    doc(id=1004, status=-3, treatment_level="c", literature_type="m",
        title_collection=[{"text": "Obra Completa", "_i": "es"}],
        english_title_collection="Complete Works",
        publication_city="Quito", publisher="Casa E",
        pages_monographic="120",
        publication_date="1955", publication_date_normalized="19550101",
        volume_monographic="2", publication_country="",
        created_time="1990-01-01T00:00:00", updated_time="1991-02-02T00:00:00"),
    dict(doc(id=1005, status=1, treatment_level="m", literature_type="t",
        title_monographic=[{"text": "Tese Título", "_i": "pt"}],
        thesis_dissertation_institution="Univ Z",
        thesis_dissertation_leader=[{"text": "Prof. X"}],
        thesis_dissertation_academic_title="Doutorado",
        title_serial="Rev. Saúde Pública",
        electronic_address=[{"_u": "http://repo.univ/t.pdf", "_y": "", "_q": "",
                             "_x": "", "_z": ""}],
        publication_date="15 jun. 2021",
        publication_date_normalized="20210615",
        created_time="2021-06-15T00:00:00", updated_time="2021-07-15T00:00:00"),
        ),
    doc(id=1006, status=1, treatment_level="as", literature_type="s",
        title=[{"text": "Vídeo Educativo", "_i": "pt"}],
        electronic_address=[
            {"_u": "http://cdn/x.mp4", "_y": "MULTIMEDIA", "_q": "", "_x": "",
             "_z": "video"},
            {"_u": "http://cdn/y.mp3", "_y": "AUDIO", "_q": "mp3", "_x": "",
             "_z": ""}],
        publication_date="2023", publication_date_normalized="20230101",
        publication_country="",
        created_time="2023-01-01T00:00:00", updated_time="2023-02-02T00:00:00"),
    doc(id=1007, status=2, treatment_level="as", literature_type="s",
        publication_country="",
        created_time="2023-01-01T00:00:00", updated_time="2023-01-01T00:00:00"),
    doc(id=1008, status=1, treatment_level="", literature_type="s",
        publication_country="",
        created_time="2023-01-01T00:00:00", updated_time="2023-01-01T00:00:00"),
    doc(id=1009, status=1, treatment_level="as", literature_type="s",
        corporate_author=[au("Organização Z", p="united states")],
        publication_date="2022", publication_date_normalized="20220101",
        publication_country="",
        created_time="2022-01-01T00:00:00", updated_time="2022-02-02T00:00:00"),
    doc(id=1010, status=1, treatment_level="as", literature_type="n",
        publication_date="1980", publication_date_normalized="19800101",
        publication_country="",
        created_time="1980-01-01T00:00:00", updated_time="1981-02-02T00:00:00"),
    # X15 project codes + conference fields + digit-leading check tag
    doc(id=1011, status=1, treatment_level="as", literature_type="sp",
        conference_name="Conf X", conference_city="Lima",
        conference_country="Peru", conference_date="abr. 2018",
        conference_normalized_date="20180401",
        conference_sponsoring_institution="Inst C",
        check_tags=["7500", "Human beings"],
        publication_date="2018", publication_date_normalized="20180401",
        publication_country="",
        created_time="2018-01-01T00:00:00", updated_time="2018-02-02T00:00:00"),
    # fulltext via 'internet' keyword; unknown descriptor dropped;
    # alternate_ids filtering out self
    doc(id=1012, LILACS_original_id="777", status=-2, treatment_level="as",
        literature_type="s",
        electronic_address=[{"_u": "INTERNET archive ref", "_y": "", "_q": "",
                             "_x": "", "_z": ""}],
        descriptors_primary=[{"text": "No Such Term"}],
        alternate_ids=["lil-777", "biblio-1012", ""],
        publication_date="2015", publication_date_normalized="20150101",
        publication_country="",
        created_time="2015-01-01T00:00:00", updated_time="2015-02-02T00:00:00"),
    # collection with NO city: fo_c emits empty -> fo dropped entirely
    doc(id=1013, status=1, treatment_level="c", literature_type="m",
        title_collection=[{"text": "Sin Ciudad", "_i": "es"}],
        publisher="Ed Z", pages_monographic="90",
        publication_date="2010", publication_date_normalized="20100101",
        publication_country="",
        created_time="2010-01-01T00:00:00", updated_time="2010-02-02T00:00:00"),
    # am with pages text (not f-l) + multiple thesis leaders + ta_fascic
    # without volume/issue (the '; , year' suffix quirk)
    doc(id=1014, status=1, treatment_level="am", literature_type="t",
        individual_author_monographic=[au("Lider, Um"), au("Lider, Dois")],
        title_monographic=[{"text": "Anexo", "_i": "pt"}],
        pages=[{"_f": "", "_l": "", "text": "xii-20", "_e": ""}],
        issn="0034-8910",
        thesis_dissertation_leader=[{"text": "Prof. A"}, {"text": "Prof. B"}],
        publication_date="2012", publication_date_normalized="20120101",
        publication_country="",
        created_time="2012-01-01T00:00:00", updated_time="2012-02-02T00:00:00"),
    # pages=[] PRESENT + pages_monographic set: reference emits NO pg
    # (key-presence, ADVICE r1 item 1)
    doc(id=1015, status=1, treatment_level="m", literature_type="m",
        title_monographic=[{"text": "Paginas Presentes Vacias", "_i": "es"}],
        pages=[], pages_monographic="200 p.",
        publication_city="La Paz", publisher="Ed R",
        publication_date="2017", publication_date_normalized="20170101",
        publication_country="",
        created_time="2017-01-01T00:00:00", updated_time="2017-02-02T00:00:00"),
    # mc/mc mutation quirk (ADVICE r1 item 5): empty-but-PRESENT
    # title_monographic += title_collection before book_title is computed
    # -> book_title comes from the collection
    doc(id=1016, status=1, treatment_level="mc", literature_type="mc",
        title_monographic=[],
        title_collection=[{"text": "Serie Andina", "_i": "es"}],
        pages_monographic="77 p.",
        publication_city="Cusco", publisher="Ed S",
        publication_date="2016", publication_date_normalized="20160101",
        publication_country="",
        created_time="2016-01-01T00:00:00", updated_time="2016-02-02T00:00:00"),
    # same shape but title_monographic ABSENT: the += mutates a fresh list,
    # doc is NOT written back -> ti fields include the collection titles but
    # book_title stays absent
    doc(id=1017, status=1, treatment_level="mc", literature_type="m",
        title_collection=[{"text": "Serie Oculta", "_i": "es"}],
        pages_monographic="88 p.",
        publication_city="Sucre", publisher="Ed T",
        publication_date="2014", publication_date_normalized="20140101",
        publication_country="",
        created_time="2014-01-01T00:00:00", updated_time="2014-02-02T00:00:00"),
    # created_time="" PRESENT + transfer_date set: python
    # doc.get('created_time', fallback) returns '' -> entry_date dropped
    # (ADVICE r1 item 3)
    doc(id=1018, status=1, treatment_level="as", literature_type="s",
        title=[{"text": "Data Vazia", "_i": "pt"}],
        publication_date="2013", publication_date_normalized="20130101",
        publication_country="",
        created_time="", transfer_date_to_database="2013-05-05",
        updated_time="2013-06-06T00:00:00"),
    # created_time ABSENT + transfer_date set: fallback fires
    doc(id=1019, status=1, treatment_level="as", literature_type="s",
        title=[{"text": "Sem Created", "_i": "pt"}],
        publication_date="2011", publication_date_normalized="20110101",
        publication_country="",
        transfer_date_to_database="2011-03-04",
        updated_time="2011-06-06T00:00:00"),
    # dirty publication_date_normalized: python int('19') parses -> huge
    # negative year term -> weight clamped to 0 (ADVICE r1 item 4)
    doc(id=1020, status=1, treatment_level="as", literature_type="s",
        title=[{"text": "Ano Curto", "_i": "pt"}],
        publication_date="19??", publication_date_normalized="19",
        publication_country="",
        created_time="2009-01-01T00:00:00", updated_time="2009-02-02T00:00:00"),
    # int('+202'[:4]) parses the sign; int('2a21') raises -> no year term
    doc(id=1021, status=1, treatment_level="as", literature_type="s",
        title=[{"text": "Ano Com Sinal", "_i": "pt"}],
        publication_date="+2024", publication_date_normalized="+2024",
        publication_country="",
        created_time="2024-01-01T00:00:00", updated_time="2024-02-02T00:00:00"),
    doc(id=1022, status=1, treatment_level="as", literature_type="s",
        title=[{"text": "Ano Sujo", "_i": "pt"}],
        publication_date="2a21", publication_date_normalized="2a21",
        publication_country="",
        created_time="2008-01-01T00:00:00", updated_time="2008-02-02T00:00:00"),
    # PRESENT-empty individual_author blocks the corporate_author fallback
    # (key-presence elif-chain); ai is computed independently and survives
    doc(id=1023, status=1, treatment_level="as", literature_type="s",
        title=[{"text": "Autores Bloqueados", "_i": "pt"}],
        individual_author=[],
        corporate_author=[au("Organização Z", p="united states")],
        publication_date="2007", publication_date_normalized="20070101",
        publication_country="",
        created_time="2007-01-01T00:00:00", updated_time="2007-02-02T00:00:00"),
]
# doc 1005: country fallback path requires publication_country key ABSENT
for d in DOCS:
    if d["id"] == 1005:
        d.pop("publication_country")

# ---------------- run the reference transform glue ----------------
STATUS_MAP = {-3: "Migrado", -2: "Coletado", -1: "Rascunho",
              0: "LILACS-Express", 1: "Publicado", 2: "Recusado", 3: "Apagado"}

def transform(doc):
    """Faithful replica of transform_and_migrate's per-doc glue
    (02_create_iahx_xml_collection.py:783-999), calling the reference's own
    functions for every non-trivial step."""
    if doc.get("status") not in (0, 1, -2, -3):
        return None
    tl = doc.get("treatment_level")
    if tl in (None, ""):
        return None

    # key-presence, not truthiness (02_create:783-786): pages=[] PRESENT
    # means standardize_pages([]) -> [] -> pg dropped, monographic unused.
    pg_value = None
    if "pages" in doc:
        pg_value = m02.standardize_pages(doc["pages"])
    elif "pages_monographic" in doc:
        pg_value = doc.get("pages_monographic")

    title_fields = m02.standardize_multilingual_title(doc)
    abstract_fields = m02.standardize_abstract(doc.get("abstract", []))
    eletronic_fields = m02.standardize_eletronic_address(doc["electronic_address"]) if doc.get("electronic_address") else {}

    # key-presence elif-chain (02_create:802-814): a PRESENT-but-empty
    # earlier field blocks every later one.
    author_fields = {}
    for k in ["individual_author", "corporate_author",
              "individual_author_monographic", "corporate_author_monographic",
              "individual_author_collection", "corporate_author_collection"]:
        if k in doc:
            author_fields = m02.standardize_individual_authors(doc[k], country_map)
            break

    author_keyword_fields = m02.standardize_author_keyword(doc["author_keyword"]) if doc.get("author_keyword") else {}
    location_fields = m02.standardize_location(doc["call_number"]) if doc.get("call_number") else {}
    fo_fields = m02.standardize_fo(doc)

    publication_country = None
    if "publication_country" in doc:
        publication_country = doc.get("publication_country")
    elif "title_serial" in doc:
        publication_country = short_country.get(doc.get("title_serial").lower().strip(), [])
        if publication_country:
            publication_country = publication_country[0]
    cp_fields, pais_fields = {}, {}
    if publication_country:
        cp_fields = m02.standardize_cp(publication_country, country_map)
        pais_fields = m02.standardize_pais_publicacao(publication_country, country_map)

    ct_values = [v for v in (misc.get_decs_mfn(t, decs_map) for t in doc.get("check_tags", [])) if v]
    pt_values = [v for v in (misc.get_decs_mfn(t, decs_map) for t in doc.get("publication_type", [])) if v]
    mj_values = [v for v in (misc.get_decs_mfn(t["text"].replace("^d", ""), decs_map)
                             for t in doc.get("descriptors_primary", []) if "text" in t) if v]
    mh_values = [v for v in (misc.get_decs_mfn(t["text"].replace("^d", ""), decs_map)
                             for t in doc.get("descriptors_secondary", []) if "text" in t) if v]

    sus = {"tema_susdigital_publico_alvo": [], "tema_susdigital_programas": []}
    for item in doc.get("community_collection_path", []):
        if "Programas" in item:
            r = m02.extract_susdigital_theme(item)
            if r:
                sus["tema_susdigital_programas"].append(r)
        if "Alvo" in item:
            r = m02.extract_susdigital_theme(item)
            if r:
                sus["tema_susdigital_publico_alvo"].append(r)

    id_fields = m02.standardize_id(doc.get("id"), doc.get("LILACS_original_id"))
    dl = doc.get("local_descriptors", "")
    dl = dl.splitlines() if isinstance(dl, str) else dl
    ta_var = m02.standardize_ta_var(doc, issn_map, short_map)

    transformed = {
        "ai": [c.get("text") for c in doc.get("corporate_author", []) + doc.get("corporate_author_monographic", [])],
        "aid": doc.get("doi_number"),
        "alternate_id": [a for a in doc.get("alternate_ids", []) if a and a != id_fields["id"]],
        "book_title": (next((tm.get("text") for tm in doc.get("title_monographic", [])), None)
                       if doc.get("title_monographic") and not (
                           doc.get("literature_type", "").upper() in ["T", "N"]
                           and not doc.get("treatment_level", "").lower().startswith("a"))
                       else None),
        "cc": doc.get("cooperative_center_code"),
        "cn_co": doc.get("conference_country"), "cn_cy": doc.get("conference_city"),
        "cn_da": doc.get("conference_normalized_date"), "cn_dt": doc.get("conference_date"),
        "cn_in": doc.get("conference_sponsoring_institution"), "cn_na": doc.get("conference_name"),
        "ct": ct_values, "cy": doc.get("publication_city"),
        "da": doc.get("publication_date_normalized", "")[:6] if doc.get("publication_date_normalized") else None,
        "database": doc.get("database"), "db": doc.get("indexed_database"),
        "descritores_locais": dl, "dp": doc.get("publication_date"),
        "ec": 1 if doc.get("clinical_trial_registry_name") else None,
        "ed": doc.get("edition"),
        "entry_date": doc.get("created_time", doc.get("transfer_date_to_database", ""))[:10].replace("-", ""),
        "id_pk": doc.get("id"), "ip": doc.get("issue_number"), "is": doc.get("issn"),
        "isbn": doc.get("isbn"), "la": doc.get("text_language"),
        "license": doc.get("license"), "mh": mh_values, "mj": mj_values,
        "nivel_tratamento": doc.get("treatment_level"),
        "no_indexing": 1 if not doc.get("descriptors_primary") and not doc.get("descriptors_secondary") else None,
        "non_decs_region": doc.get("non_decs_region"),
        "ntv": doc.get("total_number_of_volumes"),
        "ot": dl, "pg": pg_value,
        "pr_in": doc.get("project_sponsoring_institution"),
        "pr_na": doc.get("project_name"), "pr_nu": doc.get("project_number"),
        "pt": pt_values, "pu": doc.get("publisher"),
        "related_research": [str(r) for r in doc.get("related_research", [])],
        "related_resource": [str(r) for r in doc.get("related_resource", [])],
        "status_fiadmin": STATUS_MAP.get(doc.get("status")),
        "ta": doc.get("title_serial"),
        "ta_fascic": m02.standardize_ta_fascic(ta_var, doc.get("volume_serial"), doc.get("issue_number"), doc.get("publication_date_normalized", "")[:4]),
        "ta_var": ta_var,
        "tag_comunidade": doc.get("community"),
        "tag_colecao": doc.get("community_collection_path"),
        "th_in": doc.get("thesis_dissertation_institution"),
        "th_le": [ld["text"] for ld in doc.get("thesis_dissertation_leader", []) if "text" in ld],
        "th_ti": doc.get("thesis_dissertation_academic_title"),
        "tombo": doc.get("inventory_number"),
        "type": m02.determine_document_type(doc),
        "update_date": doc.get("updated_time", "")[:10].replace("-", ""),
        "vi": [v for v in [doc.get("volume_monographic"), doc.get("volume_serial")] if v],
        "weight": m02.calculate_weight(doc),
        **id_fields, **title_fields, **abstract_fields, **eletronic_fields,
        **author_keyword_fields, **author_fields, **location_fields,
        **fo_fields, **cp_fields, **pais_fields, **sus,
    }
    transformed = {k: v for k, v in transformed.items() if v not in (None, "", [], {})}

    # 02_x01: country-name capitalization + ai1→ai2 rename
    if transformed.get("pais_afiliacao"):
        transformed["pais_afiliacao"] = [m02x.normalize_afiliacao_string(x) for x in transformed["pais_afiliacao"]]
    if transformed.get("pais_publicacao"):
        transformed["pais_publicacao"] = m02x.normalize_afiliacao_string(transformed["pais_publicacao"])
    if transformed.get("ai"):
        transformed["ai"] = [ai_map.get(m02x._norm_key(v), v) for v in transformed["ai"]]
    return transformed

# The reference transform MUTATES docs in place (standardize_multilingual_title
# does `title_list += doc.get('title_collection')`), so write the fixture
# JSONL first / transform deep copies.
import copy
results = [t for t in (transform(copy.deepcopy(d)) for d in DOCS) if t]

# ---------------- emit fixture jsonl + oracle scala ----------------
os.makedirs("src/main/resources/graft/gov", exist_ok=True)
with open("src/main/resources/graft/gov/landing.jsonl", "w") as f:
    for d in DOCS:
        f.write(json.dumps(d, ensure_ascii=False) + "\n")

def lit(v):
    if v is None:
        return "NULL"
    if isinstance(v, (int, float)):
        # BIGINT so the schema matches Spark's long columns
        return f"CAST({v} AS BIGINT)"
    return "'" + str(v).replace("'", "''").replace("\n", "\\n") + "'"

def j(v, sort=False):
    """'|'-joined array or passthrough scalar; None for dropped."""
    if v is None:
        return None
    if isinstance(v, list):
        vv = sorted(v) if sort else v
        return "|".join(str(x) for x in vv) if vv else None
    return str(v)

GATES = {
    "q40_iahx_biblio": [
        ("id", lambda t: t.get("id")),
        ("id_pk", lambda t: t.get("id_pk")),
        ("fo", lambda t: t.get("fo")),
        ("lo", lambda t: t.get("lo")),
        ("pg", lambda t: j(t.get("pg"))),
        ("book_title", lambda t: t.get("book_title")),
        ("da", lambda t: t.get("da")),
        ("dp", lambda t: t.get("dp")),
        ("entry_date", lambda t: t.get("entry_date")),
        ("update_date", lambda t: t.get("update_date")),
        ("status_fiadmin", lambda t: t.get("status_fiadmin")),
        ("weight", lambda t: t.get("weight")),
        ("vi", lambda t: j(t.get("vi"))),
        ("issn", lambda t: t.get("is")),
        ("ta", lambda t: t.get("ta")),
        ("aid", lambda t: t.get("aid")),
        ("cc", lambda t: t.get("cc")),
        ("ed", lambda t: t.get("ed")),
        ("cy", lambda t: t.get("cy")),
        ("pu", lambda t: t.get("pu")),
        ("tombo", lambda t: t.get("tombo")),
        ("la", lambda t: j(t.get("la"))),
        ("dbase", lambda t: j(t.get("database"))),
        ("db", lambda t: j(t.get("db"))),
        ("ti_pt", lambda t: j(t.get("ti_pt"))),
        ("ti_en", lambda t: j(t.get("ti_en"))),
        ("ti_es", lambda t: j(t.get("ti_es"))),
        ("ab_pt", lambda t: t.get("ab_pt")),
        ("ab_en", lambda t: t.get("ab_en")),
        ("doctype", lambda t: j(t.get("type"), sort=True)),
        ("ec", lambda t: t.get("ec")),
        ("no_indexing", lambda t: t.get("no_indexing")),
        ("alternate_id", lambda t: j(t.get("alternate_id"))),
        ("related_research", lambda t: j(t.get("related_research"))),
        ("ot", lambda t: j(t.get("ot"))),
        ("ta_var", lambda t: j(t.get("ta_var"))),
        ("ta_fascic", lambda t: j(t.get("ta_fascic"))),
        ("nivel_tratamento", lambda t: t.get("nivel_tratamento")),
        ("ip", lambda t: t.get("ip")),
    ],
    "q41_iahx_authors": [
        ("id", lambda t: t.get("id")),
        ("au", lambda t: j(t.get("au"))),
        ("af", lambda t: j(t.get("af"))),
        ("afiliacao_autor", lambda t: j(t.get("afiliacao_autor"))),
        ("pais_afiliacao", lambda t: j(t.get("pais_afiliacao"))),
        ("instituicao_pais_afiliacao", lambda t: j(t.get("instituicao_pais_afiliacao"))),
        ("auid", lambda t: j(t.get("auid"))),
        ("email", lambda t: j(t.get("email"))),
        ("kw", lambda t: j(t.get("kw"))),
        ("ai", lambda t: j(t.get("ai"))),
        ("cp", lambda t: j(t.get("cp"), sort=True)),
        ("pais_publicacao", lambda t: t.get("pais_publicacao")),
    ],
    "q42_iahx_tags": [
        ("id", lambda t: t.get("id")),
        ("ct", lambda t: j(t.get("ct"))),
        ("pt", lambda t: j(t.get("pt"))),
        ("mj", lambda t: j(t.get("mj"))),
        ("mh", lambda t: j(t.get("mh"))),
        ("tema_susdigital_programas", lambda t: j(t.get("tema_susdigital_programas"))),
        ("tema_susdigital_publico_alvo", lambda t: j(t.get("tema_susdigital_publico_alvo"))),
        ("tag_comunidade", lambda t: j(t.get("tag_comunidade"))),
        ("tag_colecao", lambda t: j(t.get("tag_colecao"))),
        ("th_in", lambda t: t.get("th_in")),
        ("th_le", lambda t: j(t.get("th_le"))),
        ("th_ti", lambda t: t.get("th_ti")),
        ("ur", lambda t: j(t.get("ur"))),
        ("ur_multimedia", lambda t: j(t.get("ur_MULTIMEDIA"))),
        ("ur_audio", lambda t: j(t.get("ur_AUDIO"))),
        ("ur_meta", lambda t: j(t.get("ur_meta"))),
        ("fulltext", lambda t: t.get("fulltext")),
        ("descritores_locais", lambda t: j(t.get("descritores_locais"))),
    ],
}

# ---- K1 Solr-XML golden: serialize each 02 doc exactly like the
# reference's export (04_export_xml.py:102-121, ElementTree + indent).
# Set-derived fields (type, cp) canonicalized to sorted order — their
# iteration order is PYTHONHASHSEED-dependent in the reference.
m04 = _load("dg_04", f"{REF}/04_export_xml.py")
import xml.etree.ElementTree as ET

def to_xml(t):
    doc = dict(t)
    for k in ("type", "cp"):
        if k in doc:
            doc[k] = sorted(doc[k])
    root = ET.Element("doc", boost=str(doc.get("weight", "")))
    for key in sorted(doc.keys()):
        value = doc[key]
        if isinstance(value, list):
            for item in value:
                ET.SubElement(root, "field", name=key).text = m04.remove_invalid_xml_chars(item)
        else:
            ET.SubElement(root, "field", name=key).text = m04.remove_invalid_xml_chars(value)
    n_fields = len(root)
    ET.indent(root, space="  ", level=0)
    return ET.tostring(root, encoding="unicode"), n_fields

XMLS = {t["id"]: to_xml(t) for t in results}

out = ["package graft.gov",
       "",
       "/** GENERATED by tools/golden.py — DuckDB VALUES oracles computed by",
       "  * running the reference's own transform functions",
       "  * (/root/reference/dags/data_governance/02_*.py) on the fixture",
       "  * corpus in resources/graft/gov/landing.jsonl. Do not edit by hand.",
       "  */",
       "object GovOracle {"]
for gate, cols in GATES.items():
    names = [c for c, _ in cols]
    rows = []
    for t in sorted(results, key=lambda r: r["id_pk"]):
        rows.append("(" + ", ".join(lit(fn(t)) for _, fn in cols) + ")")
    sql = ("SELECT * FROM (VALUES\n  " + ",\n  ".join(rows) + "\n) AS t("
           + ", ".join(names) + ") ORDER BY id")
    out.append(f'  val {gate.split("_")[0]}: String =')
    out.append("    \"\"\"" + sql.replace("\n", "\n      |") + '""".stripMargin')
    out.append("")
# q44: XML per doc (newlines escaped to literal \n on both sides);
# q46: roundtrip field counts.
xml_rows = []
cnt_rows = []
for t in sorted(results, key=lambda r: r["id_pk"]):
    x, n = XMLS[t["id"]]
    xml_rows.append(f"({lit(t['id'])}, {lit(x)})")
    cnt_rows.append(f"({lit(t['id'])}, CAST({n} AS BIGINT))")
out.append("  val q44: String =")
out.append("    \"\"\"" +
           ("SELECT * FROM (VALUES\n  " + ",\n  ".join(xml_rows) +
            "\n) AS t(id, xml) ORDER BY id").replace("\n", "\n      |") +
           '""".stripMargin')
out.append("")
out.append("  val q46: String =")
out.append("    \"\"\"" +
           ("SELECT * FROM (VALUES\n  " + ",\n  ".join(cnt_rows) +
            "\n) AS t(id, n_fields) ORDER BY id").replace("\n", "\n      |") +
           '""".stripMargin')
out.append("}")
with open("src/main/scala/graft/gov/GovOracle.scala", "w") as f:
    f.write("\n".join(out) + "\n")

print(f"{len(results)} docs transformed (of {len(DOCS)})")
for t in sorted(results, key=lambda r: r["id_pk"]):
    print(t["id_pk"], t["id"], "| fo:", t.get("fo"), "| weight:", t.get("weight"),
          "| type:", t.get("type"))
