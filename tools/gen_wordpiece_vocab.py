#!/usr/bin/env python3
"""Generate the bundled realistic-scale WordPiece vocab (dev tool).

Writes src/main/resources/graft/wordpiece_vocab.txt: a DETERMINISTIC
cased de/fr/it legal-domain vocabulary at the scale of the BERT vocabs
the reference loads (~30k entries, abstract_preprocessor.py:304-310 —
bert-base-german-cased etc. ship 30 522). No randomness, no network:
the head is a curated legal/function wordlist (superset of the old
184-entry demo vocab), the tail is morphology-driven expansion.
Corpus-TRAINED vocabs are supported by the library itself
(graft.functions.WordPiece.train, the HF likelihood-scored trainer,
mirroring Bpe.train) — but the synthetic sf corpus holds only 31
distinct words and saturates a trained vocab far below BERT size,
hence this generator for the realistic-SCALE slot; the tail is
morphology-driven expansion
(root x prefix x suffix over German/French/Italian legal stems) —
structurally like a trained vocab's long tail (prefix-sharing, cased,
## continuations) so greedy longest-match does realistic work per
lookup. A production deployment drops the actual model's vocab.txt
into the same resource slot (same one-token-per-line format); the
tokenizer code is vocab-agnostic either way.

`python3 tools/gen_wordpiece_vocab.py --derive` additionally prints the
fixture segmentations used by the t16/r8/r9 oracles and WordPieceSpec,
computed by THIS file's independent greedy-longest-match mirror — the
gate values are derived here and must agree with the Scala
implementation under the DuckDB oracle (two independent
implementations, one expected answer).
"""
import sys, os

OUT = os.path.join(os.path.dirname(__file__),
                   "../src/main/resources/graft/wordpiece_vocab.txt")
TARGET = 30522  # bert-base-cased family size

SPECIALS = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]

# Œ/œ deliberately absent: a rare-codepoint → whole-word-[UNK] path must
# stay exercisable (BERT vocabs do drop rare unicode), t16 pins it.
CHARS = (
    [chr(c) for c in range(ord('a'), ord('z') + 1)] +
    [chr(c) for c in range(ord('A'), ord('Z') + 1)] +
    list("äöüÄÖÜß") + list("éèêàâçîôûëïùÉÈÀ") + list("òìíóúÒÌ") +
    list("0123456789") + list(".,;:!?()-/'\"§&%")
)

# German function/common words (cased German: nouns capitalized, the
# rest mostly lowercase; sentence-initial caps variants included for
# the frequent ones like a real cased vocab)
DE_FUNCTION = """
das die der des dem den ein eine einer eines einem einen und oder aber
nicht kein keine auch nur noch schon sehr mehr als wie bei mit nach von
vor zu zum zur aus auf in im am an ist sind war waren wird werden wurde
wurden hat haben hatte hatten kann können muss müssen soll sollen darf
dürfen will wollen mag mögen sich er sie es wir ihr ihnen ihm ihn man
wenn weil dass ob für gegen ohne durch über unter zwischen seit bis
hier dort heute gestern morgen dabei dafür dagegen damit daraus darin
somit daher deshalb jedoch allerdings insbesondere gemäss gestützt
betreffend vom sowie bzw resp ca je pro
""".split()

DE_LEGAL = """
Gericht Bundesgericht Obergericht Verwaltungsgericht Kantonsgericht
Bezirksgericht Handelsgericht Strafgericht Zivilgericht Amtsgericht
Sozialversicherungsgericht Versicherungsgericht Steuerrekursgericht
Urteil Entscheid Beschluss Verfügung Erkenntnis Zwischenentscheid
Beschwerde Rekurs Berufung Revision Einsprache Klage Widerklage
Beschwerdeführer Beschwerdeführerin Beschwerdegegner Beschwerdegegnerin
Rekurrent Rekurrentin Rekursgegner Rekursgegnerin Kläger Klägerin
Beklagte Beklagter Gesuchsteller Gesuchstellerin Gesuchsgegner
Rechtsanwalt Rechtsanwältin Advokat Advokatin Fürsprecher Fürsprecherin
Notar Notarin Richter Richterin Gerichtsschreiber Gerichtsschreiberin
Bundesrichter Bundesrichterin Oberrichter Oberrichterin Präsident
Präsidentin Vizepräsident Einzelrichter Referent Staatsanwalt
Staatsanwaltschaft Untersuchungsrichter Jugendanwalt
Recht Rechtsmittel Rechtspflege Rechtsverletzung Rechtsfrage
Rechtsbegehren Rechtsvertreter Rechtsdienst Rechtsgrundlage
Bundesrecht Kantonsrecht Zivilrecht Strafrecht Verwaltungsrecht
Versicherungsrecht Steuerrecht Baurecht Mietrecht Arbeitsrecht
Gesetz Bundesgesetz Verordnung Verfassung Bundesverfassung Reglement
Artikel Absatz Ziffer Litera Paragraph Bestimmung Norm
Sachverhalt Erwägung Erwägungen Begründung Feststellung Würdigung
Beweis Beweismittel Beweiswürdigung Zeuge Zeugin Gutachten Gutachter
Akten Aktenlage Verfahren Verfahrenskosten Gerichtskosten Kosten
Parteientschädigung Entschädigung Genugtuung Schadenersatz Busse
Frist Fristen Eingabe Eingang Zustellung Mitteilung Verhandlung
Partei Parteien Verfahrensbeteiligte Vorinstanz Instanz Behörde
Gemeinde Bezirk Kanton Kantone Bund Staat Amt Departement Direktion
Migrationsamt Steueramt Sozialamt Strassenverkehrsamt Zivilstandsamt
Ausgleichskasse Pensionskasse Krankenkasse Unfallversicherung
Invalidenversicherung Arbeitslosenversicherung Sozialversicherung
Versicherung Versicherte Versicherter Rente Leistung Leistungen
Anspruch Ansprüche Forderung Forderungen Schuld Schulden Zins Zinsen
Vertrag Verträge Vereinbarung Kaufvertrag Mietvertrag Arbeitsvertrag
Kündigung Auflösung Anfechtung Nichtigkeit Gültigkeit
Eigentum Besitz Grundstück Liegenschaft Parzelle Grundbuch
Baubewilligung Bewilligung Niederlassungsbewilligung Aufenthalt
Ehe Scheidung Trennung Unterhalt Sorgerecht Besuchsrecht Vormund
Erbe Erben Erbschaft Testament Nachlass
Konkurs Betreibung Pfändung Zwangsvollstreckung Liquidation
Aktiengesellschaft Gesellschaft Genossenschaft Stiftung Verein Firma
Arbeitgeber Arbeitgeberin Arbeitnehmer Arbeitnehmerin Angestellte
Zeugnis Lohn Gehalt Abfindung Ferien Überstunden
abgewiesen gutgeheissen eingetreten zurückgewiesen vereinigt
abgeschrieben erledigt sistiert aufgehoben bestätigt ersetzt
rechtskräftig unzulässig zulässig begründet unbegründet offensichtlich
angefochten erhoben eingereicht zugestellt eröffnet verfügt entschieden
erwogen festgestellt nachgewiesen bestritten anerkannt gewährt
verweigert verpflichtet berechtigt zuständig unzuständig
""".split()

FR_WORDS = """
le la les un une des du de et ou mais ne pas que qui quoi dont où
pour contre sans avec dans sur sous entre par est sont était étaient
sera seront a ont avait avaient peut peuvent doit doivent
tribunal cour juge juges arrêt jugement décision ordonnance recours
recourant recourante intimé intimée partie parties avocat avocate
procédure instance instances autorité autorités canton cantonal
fédéral fédérale droit droits loi lois article articles alinéa
considérant considérants fait faits preuve preuves frais dépens
indemnité assurance assurances rente prestation prestations demande
demandeur défendeur appel appelant greffier greffière président
présidente audience notification délai délais
admis rejeté irrecevable recevable fondé infondé annulé confirmé
""".split()

IT_WORDS = """
il lo la i gli le un uno una del dello della dei degli delle e o ma
non che chi per contro senza con in su tra fra da è sono era erano
sarà saranno ha hanno aveva avevano può possono deve devono
tribunale corte giudice giudici sentenza decisione decreto ricorso
ricorrente opponente parte parti avvocato avvocata procedura istanza
autorità cantone cantonale federale diritto diritti legge leggi
articolo articoli capoverso considerando fatto fatti prova prove
spese indennità assicurazione rendita prestazione prestazioni
domanda attore convenuto appello cancelliere presidente udienza
notificazione termine termini
accolto respinto inammissibile ammissibile fondato infondato annullato
confermato
""".split()

# every word-level entry of the old 184-entry demo vocab (superset
# guarantee: the compact vocab's segmentation anchors stay available)
DEMO_WORDS = """
das Das die Die der Der des und wird weist ab Gericht gericht Bundes
bundes Urteil urteil Recht recht Beschwerde beschwerde gut Kanton
Zürich
""".split()
DEMO_CONTINUATIONS = """
gericht e en er s in ung sanwalt geheissen gewiesen
""".split()

# suffix continuations a cased de/fr/it vocab carries (high-frequency
# inflection/derivation endings)
CONTINUATIONS = """
e en er es em s n in nen ung ungen lich liche lichen licher liches
keit keiten heit heiten schaft schaften bar los ig ige igen iger iges
isch ische ischen te ten t st et ete eten d nd end ende enden
tion tions ment ments eur euse aire aires ité ités ant ante ants antes
zione zioni mento menti tore tori tà ista isti
gericht gerichts sanwalt geheissen gewiesen führer führerin gegner
gegnerin recht rechts verfahren entscheid beschwerde
""".split()

# roots/prefixes/suffixes for the deterministic long tail
ROOTS = """
urteil gericht recht sprech sprach schreib schrieb les las zahl zähl
rechn führ fuhr stell stand setz sass leg lag nehm nahm geb gab halt
hielt weis wies zieh zog trag trug komm kam geh ging lauf lief fall
fiel schlag schlug greif griff werf warf bind band find fand wend
wandt kehr brauch prüf klag deut acht bericht handel wirk folg ford
wart ant arbeit bau wohn miet kauf verkauf leih schenk erb teil mess
wieg schätz steuer verschuld pfänd betreib vollstreck bewillig
versicher entschädig begründ bestreit anerkenn verweiger verpflicht
berechtig vereinbar kündig beschliess verfüg eröffn erheb reich stell
tribun jug avoc proc recour cass instru indemn prest assur
giudic ricorr procedur cassaz istru indenn prestaz assicur sentenz
""".split()

PREFIXES = ["", "be", "ge", "er", "ver", "ent", "zer", "ab", "an", "auf",
            "aus", "ein", "mit", "nach", "vor", "zu", "über", "unter",
            "wider", "weiter", "un", "ur"]

SUFFIXES = ["", "e", "en", "er", "es", "et", "te", "ten", "ung", "ungen",
            "bar", "lich", "liche", "lichen", "keit", "keiten", "nis",
            "nisse", "end", "ende", "enden", "erei", "sam", "haft", "tum"]


def mirror_tokenize(text, vocab):
    """Independent greedy longest-match mirror (BasicTokenizer + WordPiece)."""
    import unicodedata
    def is_punct(c):
        cp = ord(c)
        if 33 <= cp <= 47 or 58 <= cp <= 64 or 91 <= cp <= 96 or 123 <= cp <= 126:
            return True
        return unicodedata.category(c).startswith("P")
    words, buf = [], ""
    for c in text:
        if c.isspace():
            if buf: words.append(buf); buf = ""
        elif is_punct(c):
            if buf: words.append(buf); buf = ""
            words.append(c)
        else:
            buf += c
    if buf: words.append(buf)
    out = []
    for w in words:
        if len(w) > 100:
            out.append("[UNK]"); continue
        toks, start, bad = [], 0, False
        while start < len(w):
            end, found = len(w), None
            while end > start:
                sub = ("##" if start > 0 else "") + w[start:end]
                if sub in vocab: found = sub; break
                end -= 1
            if found is None: bad = True; break
            toks.append(found); start = end
        out.extend(["[UNK]"] if bad else toks)
    return out


def build():
    seen, vocab = set(), []
    def add(tok):
        if tok and tok not in seen:
            seen.add(tok); vocab.append(tok)
    for t in SPECIALS: add(t)
    for c in CHARS:
        add(c)
    for c in CHARS:
        if c.isalnum(): add("##" + c)
    for w in DEMO_WORDS: add(w)
    for s in DEMO_CONTINUATIONS: add("##" + s)
    for w in DE_FUNCTION + FR_WORDS + IT_WORDS:
        add(w); add(w[0].upper() + w[1:])
    for w in DE_LEGAL: add(w)
    for s in CONTINUATIONS: add("##" + s)
    # deterministic morphological tail: root-major order, capped at TARGET
    done = False
    for root in ROOTS:
        for pre in PREFIXES:
            for suf in SUFFIXES:
                w = pre + root + suf
                add(w)
                add(w[0].upper() + w[1:])
                if len(vocab) >= TARGET: done = True; break
            if done: break
        if done: break
    return vocab


FIXTURES = [
    "Das Bundesgericht weist die Beschwerde ab.",
    "Urteile des Kantons Zürich",
    "Die Beschwerde wird gutgeheissen!",
    "Œuvre unbekannt",
    "Das Bundesgericht weist die Beschwerde ab. Das Bundesgericht weist die Beschwerde ab.",
]

if __name__ == "__main__":
    vocab = build()
    with open(OUT, "w", encoding="utf-8") as f:
        f.write("\n".join(vocab) + "\n")
    print(f"wrote {len(vocab)} entries to {os.path.normpath(OUT)}")
    if "--derive" in sys.argv:
        vs = set(vocab)
        for t in FIXTURES:
            toks = mirror_tokenize(t, vs)
            print(f"{t!r}\n  -> {' '.join(toks)}\n  n={len(toks)} n_bert={len(toks)+2}")
        for w in ["Bundesgericht", "Urteile", "Kantons", "unbekannt", "Œuvre",
                  "Zivilgerichts", "qqq"]:
            toks = mirror_tokenize(w, vs)
            print(f"word {w!r} -> {toks}")
