"""F8 irregular-plural data table — pure data, importable from the
no-Spark pandas oracle (otar3088_spark/oracle.py) and from the Catalyst
expression layer (functions/text.py) alike. Public English + Latin/Greek
scientific noun morphology.
"""

from __future__ import annotations

# F8 default irregular-plural table: public English + Latin/Greek scientific
# noun morphology (the forms a spaCy lemmatizer resolves that the rule-based
# destem cannot — reference labelstudio_e2e.py:181-187). Biomedical-leaning
# selection: -a/-um, -i/-us, -ae/-a, -ces/-x, -ses/-sis, -ges/-nx declensions
# plus the common English irregulars. Plain public-knowledge dictionary data.
IRREGULAR_PLURALS: dict[str, str] = {
    # English irregulars
    "mice": "mouse", "lice": "louse", "feet": "foot", "teeth": "tooth",
    "geese": "goose", "men": "man", "women": "woman", "children": "child",
    "people": "person", "oxen": "ox",
    # -a -> -um (Latin neuter)
    "bacteria": "bacterium", "mitochondria": "mitochondrion",
    "ganglia": "ganglion", "septa": "septum", "sera": "serum",
    "media": "medium", "cilia": "cilium", "flagella": "flagellum",
    "cerebella": "cerebellum", "spectra": "spectrum", "ova": "ovum",
    "epithelia": "epithelium", "endothelia": "endothelium",
    "mycelia": "mycelium", "atria": "atrium", "ostia": "ostium",
    "labia": "labium", "ilia": "ilium", "crania": "cranium",
    "data": "datum", "strata": "stratum", "curricula": "curriculum",
    "capitula": "capitulum", "opercula": "operculum", "hila": "hilum",
    "frenula": "frenulum", "antra": "antrum", "tubercula": "tuberculum",
    # -a -> -on (Greek neuter)
    "criteria": "criterion", "phenomena": "phenomenon",
    "protozoa": "protozoon", "spermatozoa": "spermatozoon",
    "taxa": "taxon", "automata": "automaton",
    # -i -> -us (Latin masculine)
    "fungi": "fungus", "nuclei": "nucleus", "stimuli": "stimulus",
    "foci": "focus", "loci": "locus", "radii": "radius",
    "emboli": "embolus", "thrombi": "thrombus", "alveoli": "alveolus",
    "bronchi": "bronchus", "glomeruli": "glomerulus", "villi": "villus",
    "bacilli": "bacillus", "streptococci": "streptococcus",
    "staphylococci": "staphylococcus", "cocci": "coccus",
    "lactobacilli": "lactobacillus", "tali": "talus", "uteri": "uterus",
    "humeri": "humerus", "calculi": "calculus", "esophagi": "esophagus",
    "hippocampi": "hippocampus", "thalami": "thalamus",
    "hypothalami": "hypothalamus", "gyri": "gyrus", "sulci": "sulcus",
    "fasciculi": "fasciculus", "funiculi": "funiculus",
    # -ae -> -a (Latin feminine)
    "larvae": "larva", "vertebrae": "vertebra", "antennae": "antenna",
    "aortae": "aorta", "amoebae": "amoeba", "pupae": "pupa",
    "hyphae": "hypha", "conjunctivae": "conjunctiva", "scapulae": "scapula",
    "fistulae": "fistula", "maxillae": "maxilla", "papillae": "papilla",
    "sequelae": "sequela", "ulnae": "ulna", "tibiae": "tibia",
    "fibulae": "fibula", "patellae": "patella", "bursae": "bursa",
    "vesiculae": "vesicula", "lamellae": "lamella", "areolae": "areola",
    "gingivae": "gingiva", "medullae": "medulla", "retinae": "retina",
    # -ces -> -x / -ices -> -ex/-ix
    "vertices": "vertex", "indices": "index", "matrices": "matrix",
    "appendices": "appendix", "cortices": "cortex", "vortices": "vortex",
    "apices": "apex", "cervices": "cervix", "varices": "varix",
    "calyces": "calyx", "thoraces": "thorax",
    # -ses -> -sis (Greek)
    "analyses": "analysis", "diagnoses": "diagnosis",
    "prognoses": "prognosis", "hypotheses": "hypothesis",
    "theses": "thesis", "axes": "axis", "testes": "testis",
    "neuroses": "neurosis", "psychoses": "psychosis",
    "metastases": "metastasis", "stenoses": "stenosis",
    "thromboses": "thrombosis", "fibroses": "fibrosis",
    "necroses": "necrosis", "mitoses": "mitosis", "meioses": "meiosis",
    "apoptoses": "apoptosis", "symbioses": "symbiosis",
    "anastomoses": "anastomosis", "prostheses": "prosthesis",
    "syntheses": "synthesis", "crises": "crisis", "bases": "basis",
    "emphases": "emphasis",
    # -ges -> -nx (Greek)
    "pharynges": "pharynx", "larynges": "larynx", "meninges": "meninx",
    "phalanges": "phalanx",
    # -mata -> -ma (Greek neuter; -mas regular forms also exist, destem covers)
    "stomata": "stoma", "stigmata": "stigma", "schemata": "schema",
    "carcinomata": "carcinoma", "lymphomata": "lymphoma",
    "sarcomata": "sarcoma", "granulomata": "granuloma",
    "fibromata": "fibroma", "myomata": "myoma", "hematomata": "hematoma",
    # -era / misc Latin third declension
    "genera": "genus", "corpora": "corpus", "viscera": "viscus",
    "femora": "femur", "crura": "crus", "vasa": "vas", "cornua": "cornu",
}
