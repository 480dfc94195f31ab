// Harness: run a REFERENCE language analyzer over corpus lines from
// stdin, emitting term \t posInc per token with a blank line between
// docs — golden fixtures for the python chain twins
// (analysis/lang2.py).  Compiled against the reference sources in the
// /tmp/kuromoji scratch dir by tools/gen_lang2_fixtures.py.

import java.io.BufferedReader;
import java.io.InputStreamReader;
import java.io.PrintWriter;
import java.nio.charset.StandardCharsets;

import org.apache.lucene.analysis.Analyzer;
import org.apache.lucene.analysis.TokenStream;
import org.apache.lucene.analysis.tokenattributes.CharTermAttribute;
import org.apache.lucene.analysis.tokenattributes.PositionIncrementAttribute;

public class AnalyzeLang {

    static Analyzer make(String lang) {
        switch (lang) {
            case "ar":
                return new org.apache.lucene.analysis.ar.ArabicAnalyzer();
            case "fa":
                return new org.apache.lucene.analysis.fa.PersianAnalyzer();
            case "bg":
                return new org.apache.lucene.analysis.bg.BulgarianAnalyzer();
            case "cz":
                return new org.apache.lucene.analysis.cz.CzechAnalyzer();
            case "hi":
                return new org.apache.lucene.analysis.hi.HindiAnalyzer();
            case "id":
                return new org.apache.lucene.analysis.id.IndonesianAnalyzer();
            case "lv":
                return new org.apache.lucene.analysis.lv.LatvianAnalyzer();
            case "el":
                return new org.apache.lucene.analysis.el.GreekAnalyzer();
            case "gl":
                return new org.apache.lucene.analysis.gl.GalicianAnalyzer();
            // round-5: Snowball-default analyzers
            case "da":
                return new org.apache.lucene.analysis.da.DanishAnalyzer();
            case "nl":
                return new org.apache.lucene.analysis.nl.DutchAnalyzer();
            case "sv_sb":
                return new org.apache.lucene.analysis.sv.SwedishAnalyzer();
            case "no_sb":
                return new org.apache.lucene.analysis.no.NorwegianAnalyzer();
            case "ro":
                return new org.apache.lucene.analysis.ro.RomanianAnalyzer();
            case "tr":
                return new org.apache.lucene.analysis.tr.TurkishAnalyzer();
            case "hy":
                return new org.apache.lucene.analysis.hy.ArmenianAnalyzer();
            case "lt":
                return new org.apache.lucene.analysis.lt.LithuanianAnalyzer();
            case "ga":
                return new org.apache.lucene.analysis.ga.IrishAnalyzer();
            case "eu":
                return new org.apache.lucene.analysis.eu.BasqueAnalyzer();
            case "ca":
                return new org.apache.lucene.analysis.ca.CatalanAnalyzer();
            default:
                throw new IllegalArgumentException(lang);
        }
    }

    static String esc(String s) {
        return s.replace("\\", "\\\\").replace("\t", "\\t")
                .replace("\n", "\\n").replace("\r", "\\r");
    }

    public static void main(String[] args) throws Exception {
        Analyzer an = make(args[0]);
        BufferedReader r = new BufferedReader(new InputStreamReader(
                System.in, StandardCharsets.UTF_8));
        PrintWriter out = new PrintWriter(
                new java.io.OutputStreamWriter(System.out,
                        StandardCharsets.UTF_8));
        String line;
        while ((line = r.readLine()) != null) {
            TokenStream ts = an.tokenStream("f", line);
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
}
