import java.io.*;
import java.util.*;

/** Behavioral probe harness over the reference StandardTokenizerImpl DFA.
 *  Modes:
 *    sweep  - for every codepoint: tokenize probe strings, print a
 *             compact classification line.
 *    tok    - read NUL-separated UTF-8 docs from stdin; for each doc
 *             print tokens as "type,cpLen,text-cp-hex..." lines, blank
 *             line between docs. maxTokenLength drop NOT applied here
 *             (raw scanner output).
 */
public class Harness {
  static List<int[]> toks(String s) throws IOException {
    StandardTokenizerImpl sc = new StandardTokenizerImpl(new StringReader(s));
    List<int[]> out = new ArrayList<>();
    while (true) {
      int t = sc.getNextToken();
      if (t == StandardTokenizerImpl.YYEOF) break;
      String txt = sc.yytext();
      out.add(new int[]{t, txt.codePointCount(0, txt.length())});
    }
    return out;
  }

  static String sig(String s) throws IOException {
    StringBuilder b = new StringBuilder();
    for (int[] t : toks(s)) {
      if (b.length() > 0) b.append(';');
      b.append(t[0]).append(':').append(t[1]);
    }
    return b.toString();
  }

  public static void main(String[] args) throws IOException {
    if (args[0].equals("sweep")) {
      PrintWriter w = new PrintWriter(new BufferedWriter(
          new OutputStreamWriter(System.out, "UTF-8")));
      String MOD = new String(Character.toChars(0x1F3FB));
      String EMB = new String(Character.toChars(0x1F44D));
      for (int cp = 0; cp <= 0x10FFFF; cp++) {
        if (cp >= 0xD800 && cp <= 0xDFFF) continue;
        String c = new String(Character.toChars(cp));
        // single | a_b | 1_1 | lead | trail | hebq | embprobe | modprobe
        w.println(cp + "|" + sig(c) + "|" + sig("a" + c + "b") + "|"
            + sig("1" + c + "1") + "|" + sig(c + "a") + "|"
            + sig("a" + c) + "|" + sig(c + "'") + "|"
            + sig(c + MOD) + "|" + sig(EMB + c));
      }
      w.flush();
    } else if (args[0].equals("tok")) {
      BufferedReader r = new BufferedReader(
          new InputStreamReader(System.in, "UTF-8"));
      StringBuilder doc = new StringBuilder();
      PrintWriter w = new PrintWriter(new BufferedWriter(
          new OutputStreamWriter(System.out, "UTF-8")));
      int ch;
      while (true) {
        ch = r.read();
        if (ch == -1 || ch == 0) {
          StandardTokenizerImpl sc = new StandardTokenizerImpl(
              new StringReader(doc.toString()));
          while (true) {
            int t = sc.getNextToken();
            if (t == StandardTokenizerImpl.YYEOF) break;
            String txt = sc.yytext();
            StringBuilder hex = new StringBuilder();
            txt.codePoints().forEach(p -> {
              if (hex.length() > 0) hex.append('-');
              hex.append(Integer.toHexString(p));
            });
            w.println(t + "," + sc.yychar() + "," + hex);
          }
          w.println();
          w.flush();
          doc.setLength(0);
          if (ch == -1) break;
        } else {
          doc.append((char) ch);
        }
      }
    }
  }
}
