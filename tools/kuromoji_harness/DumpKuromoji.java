// Harness: build a compact IPADIC-format lexicon with the REFERENCE's
// own TokenInfoDictionaryBuilder, pair it with the reference's REAL
// ConnectionCosts / UnknownDictionary / CharacterDefinition (whose
// resources are complete in the snapshot — the full IPADIC
// TokenInfoDictionary$buffer.dat is NOT, so the stock JapaneseAnalyzer
// cannot load here), export everything to plain artifacts, and emit
// golden analyzer outputs for parity fixtures.  Compiled against the
// reference sources in a scratch dir by tools/gen_kuromoji_dict.py.
//
// Usage:
//   java DumpKuromoji posdict                      (real ctx-id -> POS)
//   java DumpKuromoji builddict <csvdir> <outdir>
//   java DumpKuromoji dump <dictbase> <outdir>
//   java DumpKuromoji analyze <dictbase>   (corpus on stdin; TSV out:
//                                           term \t posInc, blank line
//                                           between docs)
//   java DumpKuromoji tokenize <dictbase>  (tokenizer+baseform debug)

import java.io.BufferedInputStream;
import java.io.BufferedReader;
import java.io.DataOutputStream;
import java.io.FileOutputStream;
import java.io.InputStream;
import java.io.InputStreamReader;
import java.io.PrintWriter;
import java.lang.reflect.Field;
import java.nio.charset.StandardCharsets;
import java.nio.file.Paths;

import org.apache.lucene.analysis.TokenStream;
import org.apache.lucene.analysis.LowerCaseFilter;
import org.apache.lucene.analysis.StopFilter;
import org.apache.lucene.analysis.Tokenizer;
import org.apache.lucene.analysis.cjk.CJKWidthFilter;
import org.apache.lucene.analysis.ja.JapaneseAnalyzer;
import org.apache.lucene.analysis.ja.JapaneseBaseFormFilter;
import org.apache.lucene.analysis.ja.JapaneseKatakanaStemFilter;
import org.apache.lucene.analysis.ja.JapanesePartOfSpeechStopFilter;
import org.apache.lucene.analysis.ja.JapaneseTokenizer;
import org.apache.lucene.analysis.ja.dict.BinaryDictionary;
import org.apache.lucene.analysis.ja.dict.CharacterDefinition;
import org.apache.lucene.analysis.ja.dict.ConnectionCosts;
import org.apache.lucene.analysis.ja.dict.TokenInfoDictionary;
import org.apache.lucene.analysis.ja.dict.TokenInfoFST;
import org.apache.lucene.analysis.ja.dict.UnknownDictionary;
import org.apache.lucene.analysis.ja.tokenattributes.PartOfSpeechAttribute;
import org.apache.lucene.analysis.ja.util.MiniDictBuilder;
import org.apache.lucene.analysis.tokenattributes.CharTermAttribute;
import org.apache.lucene.analysis.tokenattributes.PositionIncrementAttribute;
import org.apache.lucene.codecs.CodecUtil;
import org.apache.lucene.store.InputStreamDataInput;
import org.apache.lucene.util.AttributeFactory;
import org.apache.lucene.util.IntsRef;
import org.apache.lucene.util.fst.FST;
import org.apache.lucene.util.fst.IntsRefFSTEnum;

public class DumpKuromoji {

    public static void main(String[] args) throws Exception {
        switch (args[0]) {
            case "posdict": posdict(); break;
            case "builddict":
                MiniDictBuilder.build(Paths.get(args[1]),
                        Paths.get(args[2]));
                System.out.println("built");
                break;
            case "dump": dump(args[1], args[2]); break;
            case "analyze": analyze(args[1]); break;
            default: tokenize(args[1]);
        }
    }

    static TokenInfoDictionary loadDict(String base) throws Exception {
        return new TokenInfoDictionary(
                BinaryDictionary.ResourceScheme.FILE,
                base + "/org/apache/lucene/analysis/ja/dict/"
                        + "TokenInfoDictionary");
    }

    static String esc(String s) {
        if (s == null) return "";
        return s.replace("\\", "\\\\").replace("\t", "\\t")
                .replace("\n", "\\n").replace("\r", "\\r");
    }

    // real IPADIC context-id -> POS mapping (posDict.dat is complete
    // in the snapshot even though buffer.dat is not)
    static void posdict() throws Exception {
        InputStream is = DumpKuromoji.class.getClassLoader()
                .getResourceAsStream(
                        "org/apache/lucene/analysis/ja/dict/"
                                + "TokenInfoDictionary$posDict.dat");
        is = new BufferedInputStream(is);
        InputStreamDataInput in = new InputStreamDataInput(is);
        CodecUtil.checkHeader(in, "kuromoji_dict_pos", 1, 1);
        int n = in.readVInt();
        PrintWriter out = new PrintWriter(
                new java.io.OutputStreamWriter(System.out,
                        StandardCharsets.UTF_8));
        for (int j = 0; j < n; j++) {
            String pos = in.readString();
            String inflType = in.readString();
            String inflForm = in.readString();
            out.println(j + "\t" + esc(pos) + "\t" + esc(inflType)
                    + "\t" + esc(inflForm));
        }
        out.flush();
    }

    @SuppressWarnings("unchecked")
    static void dump(String dictBase, String outDir) throws Exception {
        TokenInfoDictionary dict = loadDict(dictBase);
        TokenInfoFST tfst = dict.getFST();
        Field f = TokenInfoFST.class.getDeclaredField("fst");
        f.setAccessible(true);
        FST<Long> fst = (FST<Long>) f.get(tfst);

        // entries.tsv: surface \t leftId \t wordCost \t pos \t
        // baseForm — FST order, wordIDs in lookupWordIds order
        // (Viterbi tie-breaks depend on candidate order)
        PrintWriter pw = new PrintWriter(outDir + "/entries.tsv",
                "UTF-8");
        IntsRefFSTEnum<Long> it = new IntsRefFSTEnum<>(fst);
        IntsRefFSTEnum.InputOutput<Long> io;
        IntsRef scratch = new IntsRef();
        int maxLeft = 0;
        while ((io = it.next()) != null) {
            StringBuilder sb = new StringBuilder();
            for (int i = 0; i < io.input.length; i++) {
                sb.append((char) io.input.ints[io.input.offset + i]);
            }
            String surface = sb.toString();
            char[] chars = surface.toCharArray();
            dict.lookupWordIds(io.output.intValue(), scratch);
            for (int ofs = 0; ofs < scratch.length; ofs++) {
                int wid = scratch.ints[scratch.offset + ofs];
                int left = dict.getLeftId(wid);
                if (left != dict.getRightId(wid))
                    throw new IllegalStateException("left!=right");
                if (left > maxLeft) maxLeft = left;
                pw.println(esc(surface) + "\t" + left + "\t"
                        + dict.getWordCost(wid) + "\t"
                        + esc(dict.getPartOfSpeech(wid)) + "\t"
                        + esc(dict.getBaseForm(wid, chars, 0,
                                chars.length)));
            }
        }
        pw.close();

        // unk.tsv: className \t classId \t leftId \t cost \t pos
        UnknownDictionary unk = UnknownDictionary.getInstance();
        CharacterDefinition cd = CharacterDefinition.getInstance();
        String[] classNames = {"NGRAM", "DEFAULT", "SPACE", "SYMBOL",
                "NUMERIC", "ALPHA", "CYRILLIC", "GREEK", "HIRAGANA",
                "KATAKANA", "KANJI", "KANJINUMERIC"};
        pw = new PrintWriter(outDir + "/unk.tsv", "UTF-8");
        for (String cn : classNames) {
            byte cid = CharacterDefinition.lookupCharacterClass(cn);
            unk.lookupWordIds(cid, scratch);
            for (int ofs = 0; ofs < scratch.length; ofs++) {
                int wid = scratch.ints[scratch.offset + ofs];
                int left = unk.getLeftId(wid);
                if (left != unk.getRightId(wid))
                    throw new IllegalStateException("unk left!=right");
                if (left > maxLeft) maxLeft = left;
                pw.println(cn + "\t" + cid + "\t" + left + "\t"
                        + unk.getWordCost(wid) + "\t"
                        + esc(unk.getPartOfSpeech(wid)));
            }
        }
        pw.close();

        // costs.bin: "rows cols" then int16 LE row-major (REAL ipadic
        // bigram matrix; dims cover every ctx id either dict uses)
        ConnectionCosts costs = ConnectionCosts.getInstance();
        int dim = 1316;  // ipadic matrix is 1316x1316
        if (maxLeft >= dim) dim = maxLeft + 1;
        DataOutputStream dos = new DataOutputStream(
                new FileOutputStream(outDir + "/costs.bin"));
        dos.writeBytes(dim + " " + dim + "\n");
        for (int i = 0; i < dim; i++) {
            for (int j = 0; j < dim; j++) {
                int c = costs.get(i, j);
                dos.write(c & 0xFF);
                dos.write((c >> 8) & 0xFF);
            }
        }
        dos.close();

        // chardef.tsv: RLE over the 65536 UTF-16 units:
        // start \t end \t class \t invoke \t group \t kanji \t punct
        // (punct = JapaneseTokenizer.isPunctuation — pins the JDK's
        // Character.getType tables, not python's)
        pw = new PrintWriter(outDir + "/chardef.tsv", "UTF-8");
        int start = 0;
        String prev = null;
        for (int c = 0; c <= 0x10000; c++) {
            String key;
            if (c == 0x10000) {
                key = null;
            } else {
                char ch = (char) c;
                key = cd.getCharacterClass(ch) + "\t"
                        + (cd.isInvoke(ch) ? 1 : 0) + "\t"
                        + (cd.isGroup(ch) ? 1 : 0) + "\t"
                        + (cd.isKanji(ch) ? 1 : 0) + "\t"
                        + (isPunctuation(ch) ? 1 : 0);
            }
            if (prev != null && !prev.equals(key)) {
                pw.println(start + "\t" + (c - 1) + "\t" + prev);
                start = c;
            } else if (prev == null) {
                start = c;
            }
            prev = key;
        }
        pw.close();

        // stop sets (verbatim resource copies)
        for (String name : new String[]{"stopwords.txt",
                "stoptags.txt"}) {
            BufferedReader r = new BufferedReader(new InputStreamReader(
                    JapaneseAnalyzer.class.getResourceAsStream(name),
                    StandardCharsets.UTF_8));
            pw = new PrintWriter(outDir + "/" + name, "UTF-8");
            String line;
            while ((line = r.readLine()) != null) pw.println(line);
            pw.close();
        }
        System.out.println("dumped; costs dim=" + dim);
    }

    // mirror of JapaneseTokenizer.isPunctuation (private)
    static boolean isPunctuation(char ch) {
        switch (Character.getType(ch)) {
            case Character.SPACE_SEPARATOR:
            case Character.LINE_SEPARATOR:
            case Character.PARAGRAPH_SEPARATOR:
            case Character.CONTROL:
            case Character.FORMAT:
            case Character.DASH_PUNCTUATION:
            case Character.START_PUNCTUATION:
            case Character.END_PUNCTUATION:
            case Character.CONNECTOR_PUNCTUATION:
            case Character.OTHER_PUNCTUATION:
            case Character.MATH_SYMBOL:
            case Character.CURRENCY_SYMBOL:
            case Character.MODIFIER_SYMBOL:
            case Character.OTHER_SYMBOL:
            case Character.INITIAL_QUOTE_PUNCTUATION:
            case Character.FINAL_QUOTE_PUNCTUATION:
                return true;
            default:
                return false;
        }
    }

    // the exact JapaneseAnalyzer chain, with the custom system dict
    static TokenStream chain(Tokenizer tok) throws Exception {
        TokenStream s = new JapaneseBaseFormFilter(tok);
        s = new JapanesePartOfSpeechStopFilter(s,
                JapaneseAnalyzer.getDefaultStopTags());
        s = new CJKWidthFilter(s);
        s = new StopFilter(s, JapaneseAnalyzer.getDefaultStopSet());
        s = new JapaneseKatakanaStemFilter(s);
        s = new LowerCaseFilter(s);
        return s;
    }

    static Tokenizer newTokenizer(TokenInfoDictionary dict) {
        return new JapaneseTokenizer(
                AttributeFactory.DEFAULT_ATTRIBUTE_FACTORY, dict,
                UnknownDictionary.getInstance(),
                ConnectionCosts.getInstance(), null, true, true,
                JapaneseTokenizer.Mode.SEARCH);
    }

    static void analyze(String dictBase) throws Exception {
        TokenInfoDictionary dict = loadDict(dictBase);
        BufferedReader r = new BufferedReader(new InputStreamReader(
                System.in, StandardCharsets.UTF_8));
        PrintWriter out = new PrintWriter(
                new java.io.OutputStreamWriter(System.out,
                        StandardCharsets.UTF_8));
        String line;
        while ((line = r.readLine()) != null) {
            Tokenizer tok = newTokenizer(dict);
            tok.setReader(new java.io.StringReader(line));
            TokenStream ts = chain(tok);
            CharTermAttribute term =
                    ts.addAttribute(CharTermAttribute.class);
            PositionIncrementAttribute pi =
                    ts.addAttribute(PositionIncrementAttribute.class);
            ts.reset();
            while (ts.incrementToken()) {
                out.println(esc(term.toString()) + "\t"
                        + pi.getPositionIncrement());
            }
            ts.end();
            ts.close();
            out.println();
        }
        out.flush();
    }

    static void tokenize(String dictBase) throws Exception {
        TokenInfoDictionary dict = loadDict(dictBase);
        BufferedReader r = new BufferedReader(new InputStreamReader(
                System.in, StandardCharsets.UTF_8));
        PrintWriter out = new PrintWriter(
                new java.io.OutputStreamWriter(System.out,
                        StandardCharsets.UTF_8));
        String line;
        while ((line = r.readLine()) != null) {
            Tokenizer tok = newTokenizer(dict);
            tok.setReader(new java.io.StringReader(line));
            TokenStream ts = new JapaneseBaseFormFilter(tok);
            CharTermAttribute term =
                    ts.addAttribute(CharTermAttribute.class);
            PositionIncrementAttribute pi =
                    ts.addAttribute(PositionIncrementAttribute.class);
            PartOfSpeechAttribute pos =
                    ts.addAttribute(PartOfSpeechAttribute.class);
            ts.reset();
            while (ts.incrementToken()) {
                out.println(esc(term.toString()) + "\t"
                        + esc(pos.getPartOfSpeech()) + "\t"
                        + pi.getPositionIncrement());
            }
            ts.end();
            ts.close();
            out.println();
        }
        out.flush();
    }
}
