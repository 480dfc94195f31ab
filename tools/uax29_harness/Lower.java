import java.io.*;
public class Lower {
  public static void main(String[] a) throws IOException {
    PrintWriter w = new PrintWriter(new BufferedWriter(new OutputStreamWriter(System.out, "UTF-8")));
    for (int cp = 0; cp <= 0x10FFFF; cp++) {
      if (cp >= 0xD800 && cp <= 0xDFFF) continue;
      int lo = Character.toLowerCase(cp);
      if (lo != cp) w.println(cp + " " + lo);
    }
    w.flush();
  }
}
